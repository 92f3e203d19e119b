from mocodad_tpu.ops.fast_unet import build_fast_denoiser  # noqa: F401
