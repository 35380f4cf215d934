from .dng import dng_bytes, write_dng  # noqa: F401
from .wav import wav_bytes, write_wav, chunks_to_samples  # noqa: F401
