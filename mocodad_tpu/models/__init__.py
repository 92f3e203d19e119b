from mocodad_tpu.models.mocodad import MoCoDADModel  # noqa: F401
from mocodad_tpu.models.mocodad_latent import MoCoDADLatentModel  # noqa: F401


def build_model(cfg):
    """Model-class dispatch (ref: train_MoCoDAD.py:68).

    The reference dispatches on KEY PRESENCE (`'diffusion_on_latent' in
    args`); here `diffusion_on_latent` is a typed Config field, so the
    dispatch is value-based: any non-None value (the shipped latent
    configs set `true`) selects the latent variant, while an explicit
    `diffusion_on_latent: null` stays on the base model — the one
    documented semantic difference from the reference's hasattr check."""
    if cfg.diffusion_on_latent is not None:
        return MoCoDADLatentModel(cfg)
    return MoCoDADModel(cfg)
