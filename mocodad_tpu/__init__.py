"""mocodad_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
motion-conditioned diffusion anomaly detection on skeleton trajectories.

Re-designed from scratch with the capabilities of the MoCoDAD reference
(aleflabo/MoCoDAD, ICCV'23); see SURVEY.md for the structural map.  The
compute path is functional JAX (flax.linen modules, optax optimizers,
`lax.scan` diffusion chains, `pjit`-sharded training over a device mesh);
the host path (trajectory loading, windowing, scoring) is NumPy.
"""

__version__ = "0.1.0"

from mocodad_tpu.config import Config, load_config, init_args  # noqa: F401
