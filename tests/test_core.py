import os

import pytest

from mergenet_tpu.core import CoreConfig, generate_offsets, validate_offsets


def test_generate_offsets_default():
    # reference default documented at core_config.py:43-44 is the same spiral
    # with max_offset such that it ends at (-21, 0)
    offs = generate_offsets(20, 10)
    assert len(offs) == 10
    assert offs[0] == (1, 0)
    assert offs[1] == (0, 1)
    validate_offsets(offs)
    # last offset has max-coordinate ~ max_offset
    assert max(abs(offs[-1][0]), abs(offs[-1][1])) in (19, 20, 21)


def test_generate_offsets_matches_reference_series():
    # the exact series the reference CoreConfig documents for size_ratio=1.4
    offs = generate_offsets(21, 10)
    assert offs == [(1, 0), (0, 1), (-2, -1), (1, -2), (3, 2),
                    (-4, 3), (-4, -7), (10, -4), (3, 15), (-21, 0)]


def test_validate_offsets_rejects_bad():
    with pytest.raises(AssertionError):
        validate_offsets([(0, 0)])
    with pytest.raises(AssertionError):
        validate_offsets([(1, 0), (1, 0)])
    with pytest.raises(AssertionError):
        validate_offsets([(1, 0), (-1, 0)])  # negated pair


def test_core_config_roundtrip(tmp_path):
    c = CoreConfig()
    c.num_classes = 9
    c.num_colors = 3
    c.offsets = generate_offsets(40, 10)
    p = os.path.join(tmp_path, "core.conf")
    c.write(p)
    c2 = CoreConfig()
    c2.read(p)
    assert c2.num_classes == 9
    assert c2.num_colors == 3
    assert c2.offsets == c.offsets
    assert c2.padding == c.padding
    # write-read-write stability (reference core_config.py:129-134)
    c2.write(p)
    c3 = CoreConfig()
    c3.read(p)
    assert c3.offsets == c.offsets
