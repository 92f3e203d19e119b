from mocodad_tpu.models.mocodad import MoCoDADModel  # noqa: F401
from mocodad_tpu.models.mocodad_latent import MoCoDADLatentModel  # noqa: F401


def build_model(cfg):
    """Model-class dispatch: the presence of the `diffusion_on_latent` key
    selects the latent variant (ref: train_MoCoDAD.py:68)."""
    if cfg.diffusion_on_latent is not None or 'diffusion_on_latent' in cfg.extras:
        return MoCoDADLatentModel(cfg)
    return MoCoDADModel(cfg)
