"""Parameter-object contract tests.

Role of reference */parameters_test.go files (every codec package has
one): string-keyed GetParameter/SetParameter semantics, fluent With*
builders returning copies, Validate errors, and the typed parameter
classes' defaults.
"""

import pytest

from go_dicom_codec_tpu.errors import InvalidParameterError
from go_dicom_codec_tpu.params import (Parameters, optional_int,
                                       require_range)


def test_get_set_roundtrip():
    p = Parameters(quality=80)
    assert p.get_parameter("quality") == 80
    p.set_parameter("quality", 95)
    assert p.get_parameter("quality") == 95


def test_get_default_for_missing():
    p = Parameters()
    assert p.get_parameter("nope") is None
    assert p.get_parameter("nope", 7) == 7


def test_contains_and_iter():
    p = Parameters(a=1, b=2)
    assert "a" in p and "c" not in p
    assert sorted(p) == ["a", "b"]


def test_with_returns_copy():
    p = Parameters(quality=80)
    q = p.with_("quality", 10)
    assert p.get_parameter("quality") == 80
    assert q.get_parameter("quality") == 10


def test_copy_is_independent():
    p = Parameters(x=1)
    c = p.copy()
    c.set_parameter("x", 2)
    assert p.get_parameter("x") == 1


def test_require_range_accepts_bounds():
    assert require_range("q", 1, 1, 100) == 1
    assert require_range("q", 100, 1, 100) == 100


def test_require_range_rejects_out_of_bounds():
    with pytest.raises(InvalidParameterError):
        require_range("q", 0, 1, 100)
    with pytest.raises(InvalidParameterError):
        require_range("q", 101, 1, 100)


def test_optional_int_coercion():
    p = Parameters(n=5)
    assert optional_int(p, "n", 9) == 5
    assert optional_int(p, "missing", 9) == 9
    assert optional_int(None, "n", 9) == 9


def test_baseline_parameters_validate():
    from go_dicom_codec_tpu.codecs.jpeg_baseline import \
        JPEGBaselineParameters

    JPEGBaselineParameters(quality=50).validate()
    with pytest.raises(InvalidParameterError):
        JPEGBaselineParameters(quality=0).validate()
    assert JPEGBaselineParameters().with_quality(33).quality == 33


def test_j2k_params_fluent_and_clamp():
    from go_dicom_codec_tpu.codecs.jpeg2000 import J2KEncodeParams

    p = J2KEncodeParams(num_levels=5)
    # small images clamp levels like reference lossy/codec.go:392
    assert p.clamped_levels(8, 8) < 5
    assert p.clamped_levels(512, 512) == 5


def test_jls_near_parameter():
    from go_dicom_codec_tpu.codecs.jpegls import JPEGLSParameters

    p = JPEGLSParameters(near=3)
    assert p.get_parameter("near") == 3
    p.validate()
