from .media import MediumTable, pack_media, medium_sample_distance, medium_transmittance, MediumSample
