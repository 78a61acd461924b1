"""Beacon receiver: drift detection/correction + known-payload detection."""

from .detect import KnownDetection, detect_known_payload, known_track_scores
from .drift import (apply_polynomial_drift, correct_frequency_drift,
                    detect_signal_continuity)

__all__ = ["apply_polynomial_drift", "correct_frequency_drift",
           "detect_signal_continuity", "KnownDetection",
           "detect_known_payload", "known_track_scores"]
