"""Stage-timer instrumentation (SURVEY §5: tracing is greenfield)."""

import numpy as np

from go_dicom_codec_tpu.codecs.jpeg2000 import J2KEncodeParams, J2KEncoder
from go_dicom_codec_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report() and "ms/call" in t.report()


def test_encoder_reports_stages(rng):
    timer = profiling.enable_global_timer()
    try:
        img = (np.cumsum(rng.integers(-9, 10, (64, 64)), axis=1)
               % 4096).astype("<u2")
        J2KEncoder(J2KEncodeParams(lossless=True)).encode(
            img.tobytes(), 64, 64, 1, 12, False)
        assert timer.counts["j2k.encode.transform"] >= 1
        assert timer.counts["j2k.encode.entropy"] >= 1
        assert timer.totals["j2k.encode.entropy"] > 0
    finally:
        profiling.GLOBAL_TIMER = None
