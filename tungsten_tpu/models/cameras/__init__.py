from .pinhole import camera_rays, camera_rays_w
from .tonemap import tonemap
