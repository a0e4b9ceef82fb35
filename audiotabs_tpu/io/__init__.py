from .wav import load_wav, read_wav, write_wav, peak_normalize, decode_to_mono_44k
from .resample import resample_poly_host, resample_kernel_jax

__all__ = [
    "load_wav",
    "read_wav",
    "write_wav",
    "peak_normalize",
    "decode_to_mono_44k",
    "resample_poly_host",
    "resample_kernel_jax",
]
