"""Exception hierarchy mirroring the reference decoder's error model.

The reference defines MotionCamException and IOException (Decoder.hpp:31-39)
and throws IOException on every failure path. The TPU framework keeps that
two-level shape and adds DecodeError for codec-level failures, which the
reference signals only via a <=0 return from raw::Decode (Decoder.cpp:225-230
then wraps it in an IOException).
"""


class MotionCamException(RuntimeError):
    """Base class for all mcraw errors (Decoder.hpp:31-34)."""


class IOException(MotionCamException):
    """Container / file-level failure (Decoder.hpp:36-39)."""


class DecodeError(IOException):
    """Codec-level failure (truncated or malformed block data)."""
