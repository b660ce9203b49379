from .phase import phase_eval, phase_sample, phase_pdf, phase_id, PHASE_ISOTROPIC, PHASE_HG, PHASE_RAYLEIGH
