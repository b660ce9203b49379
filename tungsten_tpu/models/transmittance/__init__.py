from .transmittance import (
    trans_id,
    trans_eval,
    trans_surface_prob,
    trans_medium_pdf,
    trans_sample,
    trans_sigma_bar, _sigma_bar_full,
)
