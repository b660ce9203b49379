from . import transform, vecops
