from .sampler import Sampler
from . import warps
