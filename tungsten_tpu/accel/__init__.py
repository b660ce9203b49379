from .bvh import BvhArrays, build_bvh
