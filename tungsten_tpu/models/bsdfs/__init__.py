from .common import Lobes, BsdfSample
from .dispatch import (
    MaterialTable,
    pack_materials,
    bsdf_eval,
    bsdf_sample,
    bsdf_pdf,
    module_for_id,
)
