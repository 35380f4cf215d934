"""Typed accessors for container- and frame-level JSON metadata.

The implicit schema the reference reads (SURVEY.md §2.3):
- container JSON: extraData.audioSampleRate / audioChannels
  (Decoder.cpp:162-167), blackLevel, whiteLevel, colorMatrix1/2,
  forwardMatrix1/2, and the *misspelled* key ``sensorArrangment``
  (example.cpp:66-72 — no second 'e'; preserved deliberately).
- frame JSON: width, height, compressionType (Decoder.cpp:216-218),
  asShotNeutral (example.cpp:64).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .errors import MotionCamException

# CFA byte patterns per sensor arrangement (example.cpp:96-105).
CFA_PATTERNS: dict[str, bytes] = {
    "rggb": bytes((0, 1, 1, 2)),
    "bggr": bytes((2, 1, 1, 0)),
    "grbg": bytes((1, 0, 2, 1)),
    "gbrg": bytes((1, 2, 0, 1)),
}


@dataclass(frozen=True)
class ContainerMetadata:
    raw: dict

    @property
    def audio_sample_rate(self) -> int:
        return int(self.raw["extraData"]["audioSampleRate"])

    @property
    def audio_channels(self) -> int:
        return int(self.raw["extraData"]["audioChannels"])

    @property
    def black_level(self) -> np.ndarray:
        return np.asarray(self.raw["blackLevel"], dtype=np.uint16)

    @property
    def white_level(self) -> float:
        return float(self.raw["whiteLevel"])

    @property
    def sensor_arrangement(self) -> str:
        # Key is misspelled in real containers; honor it (example.cpp:68).
        return str(self.raw["sensorArrangment"])

    @property
    def cfa_pattern(self) -> bytes:
        arr = self.sensor_arrangement
        if arr not in CFA_PATTERNS:
            raise MotionCamException("Invalid sensor arrangement")
        return CFA_PATTERNS[arr]

    def color_matrix(self, which: int) -> np.ndarray:
        return np.asarray(self.raw[f"colorMatrix{which}"], dtype=np.float32)

    def forward_matrix(self, which: int) -> np.ndarray:
        return np.asarray(self.raw[f"forwardMatrix{which}"], dtype=np.float32)


@dataclass(frozen=True)
class FrameMetadata:
    raw: dict

    @property
    def width(self) -> int:
        return int(self.raw["width"])

    @property
    def height(self) -> int:
        return int(self.raw["height"])

    @property
    def compression_type(self) -> int:
        return int(self.raw["compressionType"])

    @property
    def as_shot_neutral(self) -> np.ndarray:
        return np.asarray(self.raw["asShotNeutral"], dtype=np.float32)


def example_container_metadata(
    sample_rate: int = 48000,
    channels: int = 2,
    sensor: str = "rggb",
    black_level: tuple[int, int, int, int] = (64, 64, 64, 64),
    white_level: float = 1023.0,
) -> dict:
    """A minimal schema-complete container JSON for fixtures."""
    ident = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    return {
        "extraData": {"audioSampleRate": sample_rate, "audioChannels": channels},
        "blackLevel": list(black_level),
        "whiteLevel": white_level,
        "sensorArrangment": sensor,
        "colorMatrix1": ident,
        "colorMatrix2": ident,
        "forwardMatrix1": ident,
        "forwardMatrix2": ident,
    }


def example_frame_metadata(
    width: int, height: int, compression_type: int = 7
) -> dict:
    return {
        "width": width,
        "height": height,
        "compressionType": compression_type,
        "asShotNeutral": [0.5, 1.0, 0.6],
    }
