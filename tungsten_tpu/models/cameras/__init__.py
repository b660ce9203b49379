from .pinhole import camera_rays
from .tonemap import tonemap
