"""Catalog transcription pins: the engine's event-schema data must equal
the reference templates byte-for-byte wherever the reference defines it.

The ChFinAnn catalog (config.CHFINANN_EVENT_TYPES) transcribes
dee/event_types/zheng2019_trigger_graph.py — field lists, min-field
counts, and the FULL pseudo-trigger tier table (|R| = 1..9 per type;
an earlier transcription carried only tiers 1-2, with a wrong tier 1
for EquityPledge, which silently changed every default trigger-mode
decode).  WikiEvents parity is pinned in test_wikievents_fidelity."""

from __future__ import annotations

import os
import types

import pytest

from docee_spark.config import CHFINANN_EVENT_TYPES

TEMPLATE = "/root/reference/dee/event_types/zheng2019_trigger_graph.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TEMPLATE), reason="reference template not present"
)


def _ref_template():
    src = open(TEMPLATE).read()
    mod = types.ModuleType("zheng2019_ref")
    exec(compile(src, "zheng2019_ref", "exec"), mod.__dict__)
    return mod


def test_chfinann_fields_and_minima_match_reference():
    mod = _ref_template()
    ref = {e[0]: (tuple(e[1]), e[3]) for e in mod.event_type_fields_list}
    ours = {
        et.name: (et.fields, et.min_field_num) for et in CHFINANN_EVENT_TYPES
    }
    assert ours == ref


def test_chfinann_trigger_tiers_match_reference():
    mod = _ref_template()
    ref = {
        e[0]: {k: set(v) for k, v in e[2].items() if isinstance(k, int)}
        for e in mod.event_type_fields_list
    }
    ours = {
        et.name: {k: set(v) for k, v in et.triggers.items()}
        for et in CHFINANN_EVENT_TYPES
    }
    assert ours == ref


def test_all_tier_equals_fields():
    """TRIGGERS['all'] == FIELDS in the template; the catalog omits the
    string tier because |R| ≥ max int tier already selects every role."""
    mod = _ref_template()
    for e in mod.event_type_fields_list:
        assert set(e[2]["all"]) == set(e[1]), e[0]
        int_max = max(k for k in e[2] if isinstance(k, int))
        assert set(e[2][int_max]) == set(e[1]), e[0]
