from .media import (
    MediumSample,
    MediumTable,
    medium_distance_pdf,
    medium_sample_distance,
    medium_transmittance,
    pack_media,
)
