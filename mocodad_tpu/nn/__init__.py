from mocodad_tpu.nn.stsgcn import (  # noqa: F401
    ConvTemporalGraphical, STGCNNLayer, JointMixLayer)
from mocodad_tpu.nn.components import Encoder, Decoder, Denoiser  # noqa: F401
from mocodad_tpu.nn.stsae import STSE, STSAE  # noqa: F401
from mocodad_tpu.nn.unet import STSEUnet, STSAEUnet  # noqa: F401
