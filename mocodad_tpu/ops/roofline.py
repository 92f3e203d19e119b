"""Analytical cost model for the MoCoDAD denoiser on TPU.

Two numbers per U-Net forward, both per window-sample per denoise step:

  * useful_flops: algorithmic FLOPs of the layer chain (what MFU is
    measured against);
  * mxu_row_cost: the MXU-granularity roofline — every dot lowers to
    (M, K)@(K, N) with time ~ M * ceil(K/128) * ceil(N/128) row-passes,
    so tiny contraction dims (T*V <= 102, C <= 128) waste most of the
    128x128 systolic array no matter how the kernel is written.  This is
    the honest ceiling for this model family on TPU; quote efficiency
    against it, not against peak FLOPs.

Numbers are exact for the shipped STSAEUnet topology (nn/unet.py); the
hot op in the reference is the einsum pair models/gcae/stsgcn.py:154-155.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from mocodad_tpu.nn.unet import joint_pyramid

# v5e ("TPU v5 lite") per-chip peaks
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 99e12
HBM_BYTES_PER_S = 819e9


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


@dataclass
class UnetCost:
    useful_flops: float     # per sample per U-Net forward
    mxu_row_cost: float     # row-passes x 2*128*128 FLOP-equivalents
    act_bytes: int          # activation bytes written per sample (bf16=2)

    def floor_seconds(self, n_samples: int, dtype_bytes: int = 2) -> float:
        peak = PEAK_BF16_FLOPS if dtype_bytes == 2 else PEAK_F32_FLOPS
        return n_samples * self.mxu_row_cost / peak


def unet_cost(n_frames: int, n_joints: int,
              down_channels: Sequence[int] = (16, 32, 32, 64, 64, 128, 64),
              up_channels: Optional[Sequence[int]] = None,
              c_in: int = 2, emb_dim: int = 16,
              dtype_bytes: int = 2) -> UnetCost:
    """Cost of one STSAEUnet forward for one sample."""
    jp = joint_pyramid(n_joints)
    dn = list(down_channels)
    up = list(up_channels) if up_channels is not None else [64, 32, 32, c_in]
    t = n_frames
    tva, tvb, tvc = t * jp['a'], t * jp['b'], t * jp['c']

    gcn: List[Tuple[int, int, int]] = [
        (tva, c_in, dn[0]), (tva, dn[0], dn[1]), (tva, dn[1], dn[2]),
        (tvb, dn[2], dn[3]), (tvb, dn[3], dn[4]),
        (tvc, dn[4], dn[5]), (tvc, dn[5], dn[6]),
        (tvb, dn[6], up[0]), (tvb, up[0], up[1]),
        (tva, up[1], up[2]), (tva, up[2], up[3]),
    ]
    joints = [(tva, tvb, dn[2]), (tvb, tvc, dn[4]), (tvc, tvb, dn[6]),
              (tvb, tva, up[1])]

    useful = 0.0
    rows = 0.0      # in units of one M-row through a (<=128, <=128) tile
    act = 0
    for tv, ci, co in gcn:
        useful += 2 * tv * tv * ci          # graph mix
        useful += 2 * tv * ci * co          # channel mix
        # weight-lhs dots (ops/pallas_unet.py): graph (TVq,TVx)@(Ci,TVx,N)
        # costs TVq*ceil(Ci*N/128N)... per sample: TVq*Ci/128; channel
        # (Co,Ci)@(TVq,Ci,N) per sample: Co*TVq/128
        rows += tv * _ceil(tv, 128) * ci / 128
        rows += co * _ceil(ci, 128) * tv / 128
        if ci != co:                        # residual 1x1 conv
            useful += 2 * tv * ci * co
            rows += co * _ceil(ci, 128) * tv / 128
        useful += 2 * emb_dim * co          # embedding projection
        rows += co * _ceil(emb_dim, 128) / 128
        act += tv * co * dtype_bytes
    for tvi, tvo, c in joints:
        # per-t joint mix is block-diagonal; executed as (TVo,TVi) operator
        useful += 2 * tvi * tvo * c
        rows += tvo * _ceil(tvi, 128) * c / 128
        act += tvo * c * dtype_bytes

    return UnetCost(useful_flops=useful,
                    mxu_row_cost=rows * 2 * 128 * 128,
                    act_bytes=act)
