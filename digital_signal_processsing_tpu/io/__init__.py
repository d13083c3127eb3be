from .wav import WavInfo, read_wav, write_wav, read_wav_widened  # noqa: F401

__all__ = ["WavInfo", "read_wav", "write_wav", "read_wav_widened"]
