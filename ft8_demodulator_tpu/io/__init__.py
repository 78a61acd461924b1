"""Host I/O: WAV files."""

from .wav import read_wave_file, write_wave_file

__all__ = ["read_wave_file", "write_wave_file"]
