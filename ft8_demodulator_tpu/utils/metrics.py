"""Structured per-slot decode metrics (SURVEY §5: observability).

The reference's observability is ad-hoc prints inside the decode hot path
(src/ft8_tools/ft8_demodulator/ft8_decode.py:110-147).  Here metrics are
derived from the fixed-shape SlotDecodeResult after the fact — nothing
observes from inside the jitted program.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

import numpy as np

__all__ = ["SlotMetrics", "summarize_slot"]


@dataclass(frozen=True)
class SlotMetrics:
    candidates_found: int       # candidates above min_score
    decodes: int                # accepted (LDPC+CRC) candidates
    unique_messages: int        # distinct message hashes among decodes
    best_score: float
    mean_score: float
    mean_ldpc_errors: float     # over rejected candidates

    def asdict(self) -> dict:
        return asdict(self)


def summarize_slot(result) -> SlotMetrics:
    """SlotDecodeResult (host or device arrays) -> SlotMetrics."""
    valid = np.asarray(result.candidate_valid)
    success = np.asarray(result.success)
    score = np.asarray(result.score)
    ldpc = np.asarray(result.ldpc_errors)
    crc = np.asarray(result.crc)
    n_valid = int(valid.sum())
    rejected = valid & ~success
    return SlotMetrics(
        candidates_found=n_valid,
        decodes=int(success.sum()),
        unique_messages=len(set(crc[success].tolist())),
        best_score=float(score[valid].max()) if n_valid else float("-inf"),
        mean_score=float(score[valid].mean()) if n_valid else float("nan"),
        mean_ldpc_errors=float(ldpc[rejected].mean()) if rejected.any()
        else 0.0,
    )
