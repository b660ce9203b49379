from .textures import TextureTable, TextureBuilder, eval_texture, TEX_CONSTANT, TEX_CHECKER, TEX_BITMAP
from .textures import texture_from_spec
