"""Beacon receiver: frequency-drift detection and correction."""

from .drift import (apply_polynomial_drift, correct_frequency_drift,
                    detect_signal_continuity)

__all__ = ["apply_polynomial_drift", "correct_frequency_drift",
           "detect_signal_continuity"]
