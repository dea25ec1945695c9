"""TDD slot patterns (NR tdd-UL-DL-ConfigCommon + LTE Table 4.2-2)."""
import numpy as np

from openairinterface5g_tpu.runtime.tdd import (LTE_TDD_CONFIGS, TddConfig,
                                                lte_tdd_counts)


def test_nr_pattern_7_6_2_4():
    t = TddConfig.from_string("7,6,2,4")
    assert t.period_slots == 10
    assert t.pattern() == "DDDDDDDSUU"
    dl, ul = t.mixed_slot_symbols()
    assert dl == (0, 1, 2, 3, 4, 5) and ul == (10, 11, 12, 13)
    # pattern repeats across periods
    assert t.slot_type(17) == "S" and t.slot_type(18) == "U"
    assert t.slot_type(20) == "D"


def test_nr_pattern_2_5ms():
    t = TddConfig.from_string("3,6,1,4,2.5")
    assert t.period_slots == 5
    assert t.pattern() == "DDDSU"


def test_lte_tdd_configs():
    assert len(LTE_TDD_CONFIGS) == 7
    assert LTE_TDD_CONFIGS[1] == "DSUUDDSUUD"
    assert lte_tdd_counts(1) == (4, 2, 4)
    assert lte_tdd_counts(5) == (8, 1, 1)
    for c, p in LTE_TDD_CONFIGS.items():
        assert len(p) == 10 and p[0] == "D" and p[1] == "S" and p[2] == "U"
