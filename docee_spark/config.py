"""Event-schema catalog and tagger configuration.

The reference expresses event schemas as static Python modules selected by
name at runtime (``get_event_template``, reference
``dee/event_types/__init__.py:15-18``). Each template exports
``event_type_fields_list = [(name, fields, triggers, min_field_num), ...]``
and ``common_fields`` (reference ``dee/event_types/zheng2019_trigger_graph.py:
430,442-464``). Here the catalog is plain data: a small dict that the engine
broadcasts to executors. Five ChFinAnn event types with the published role
inventories (Zheng et al. 2019, "Doc2EDAG", EMNLP).

The BIO entity-label vocabulary is derived exactly as the reference does
(``dee/helper/dee.py:204-220``): ``['O'] + [B-X, I-X for each field]`` over
the union of common fields and all event roles, so B labels sit at odd
indices and the matching I label at B+1 — the span decoder relies on this
parity (see ``pyref/spans.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EventType:
    name: str
    fields: tuple[str, ...]
    # pseudo-trigger sets keyed by |R| (reference zheng2019_trigger_graph.py:72-111)
    triggers: dict[int, tuple[str, ...]] = field(default_factory=dict)
    min_field_num: int = 2
    key_fields: tuple[str, ...] = ()


COMMON_FIELDS: tuple[str, ...] = ("StockCode", "StockAbbr", "CompanyName", "OtherType")

# ChFinAnn catalog — role lists as published in the Doc2EDAG paper and the
# reference template (zheng2019_trigger_graph.py:69-464).
CHFINANN_EVENT_TYPES: tuple[EventType, ...] = (
    EventType(
        "EquityFreeze",
        (
            "EquityHolder",
            "FrozeShares",
            "LegalInstitution",
            "TotalHoldingShares",
            "TotalHoldingRatio",
            "StartDate",
            "EndDate",
            "UnfrozeDate",
        ),
        triggers={
            1: ('LegalInstitution',),
            2: ('FrozeShares', 'LegalInstitution'),
            3: ('FrozeShares', 'LegalInstitution', 'StartDate'),
            4: ('EquityHolder', 'FrozeShares', 'LegalInstitution', 'StartDate'),
            5: ('EquityHolder', 'FrozeShares', 'LegalInstitution', 'StartDate', 'TotalHoldingRatio'),
            6: ('EquityHolder', 'FrozeShares', 'LegalInstitution', 'StartDate', 'TotalHoldingRatio', 'UnfrozeDate'),
            7: ('EquityHolder', 'FrozeShares', 'LegalInstitution', 'StartDate', 'TotalHoldingRatio', 'TotalHoldingShares', 'UnfrozeDate'),
            8: ('EndDate', 'EquityHolder', 'FrozeShares', 'LegalInstitution', 'StartDate', 'TotalHoldingRatio', 'TotalHoldingShares', 'UnfrozeDate'),
        },
        min_field_num=5,
        key_fields=("EquityHolder",),
    ),
    EventType(
        "EquityRepurchase",
        (
            "CompanyName",
            "HighestTradingPrice",
            "LowestTradingPrice",
            "RepurchasedShares",
            "ClosingDate",
            "RepurchaseAmount",
        ),
        triggers={
            1: ('RepurchasedShares',),
            2: ('RepurchaseAmount', 'RepurchasedShares'),
            3: ('ClosingDate', 'RepurchaseAmount', 'RepurchasedShares'),
            4: ('ClosingDate', 'CompanyName', 'RepurchaseAmount', 'RepurchasedShares'),
            5: ('ClosingDate', 'CompanyName', 'HighestTradingPrice', 'RepurchaseAmount', 'RepurchasedShares'),
            6: ('ClosingDate', 'CompanyName', 'HighestTradingPrice', 'LowestTradingPrice', 'RepurchaseAmount', 'RepurchasedShares'),
        },
        min_field_num=4,
        key_fields=("CompanyName",),
    ),
    EventType(
        "EquityUnderweight",
        (
            "EquityHolder",
            "TradedShares",
            "StartDate",
            "EndDate",
            "LaterHoldingShares",
            "AveragePrice",
        ),
        triggers={
            1: ('TradedShares',),
            2: ('EndDate', 'EquityHolder'),
            3: ('EquityHolder', 'StartDate', 'TradedShares'),
            4: ('EndDate', 'EquityHolder', 'StartDate', 'TradedShares'),
            5: ('EndDate', 'EquityHolder', 'LaterHoldingShares', 'StartDate', 'TradedShares'),
            6: ('AveragePrice', 'EndDate', 'EquityHolder', 'LaterHoldingShares', 'StartDate', 'TradedShares'),
        },
        min_field_num=4,
        key_fields=("EquityHolder",),
    ),
    EventType(
        "EquityOverweight",
        (
            "EquityHolder",
            "TradedShares",
            "StartDate",
            "EndDate",
            "LaterHoldingShares",
            "AveragePrice",
        ),
        triggers={
            1: ('TradedShares',),
            2: ('EquityHolder', 'StartDate'),
            3: ('EquityHolder', 'StartDate', 'TradedShares'),
            4: ('EquityHolder', 'LaterHoldingShares', 'StartDate', 'TradedShares'),
            5: ('EndDate', 'EquityHolder', 'LaterHoldingShares', 'StartDate', 'TradedShares'),
            6: ('AveragePrice', 'EndDate', 'EquityHolder', 'LaterHoldingShares', 'StartDate', 'TradedShares'),
        },
        min_field_num=4,
        key_fields=("EquityHolder",),
    ),
    EventType(
        "EquityPledge",
        (
            "Pledger",
            "PledgedShares",
            "Pledgee",
            "TotalHoldingShares",
            "TotalHoldingRatio",
            "TotalPledgedShares",
            "StartDate",
            "EndDate",
            "ReleasedDate",
        ),
        triggers={
            1: ('PledgedShares',),
            2: ('PledgedShares', 'StartDate'),
            3: ('EndDate', 'PledgedShares', 'StartDate'),
            4: ('EndDate', 'PledgedShares', 'ReleasedDate', 'StartDate'),
            5: ('EndDate', 'PledgedShares', 'Pledgee', 'ReleasedDate', 'StartDate'),
            6: ('EndDate', 'PledgedShares', 'Pledgee', 'Pledger', 'ReleasedDate', 'StartDate'),
            7: ('EndDate', 'PledgedShares', 'Pledgee', 'Pledger', 'ReleasedDate', 'StartDate', 'TotalPledgedShares'),
            8: ('EndDate', 'PledgedShares', 'Pledgee', 'Pledger', 'ReleasedDate', 'StartDate', 'TotalHoldingShares', 'TotalPledgedShares'),
            9: ('EndDate', 'PledgedShares', 'Pledgee', 'Pledger', 'ReleasedDate', 'StartDate', 'TotalHoldingRatio', 'TotalHoldingShares', 'TotalPledgedShares'),
        },
        min_field_num=7,
        key_fields=("Pledger",),
    ),
)


# role → regex-extractable type, mirroring RegexEntExtractor.field2type
# (reference dee/utils.py:531-583). Used by the complementary-entity merge
# (J3) and fix_ent-style snapping (J4).
FIELD2REGEX_TYPE: dict[str, str] = {
    "TotalHoldingShares": "share",
    "TotalPledgedShares": "share",
    "PledgedShares": "share",
    "FrozeShares": "share",
    "RepurchasedShares": "share",
    "TradedShares": "share",
    "LaterHoldingShares": "share",
    "TotalHoldingRatio": "ratio",
    "StartDate": "date",
    "ReleasedDate": "date",
    "EndDate": "date",
    "ClosingDate": "date",
    "UnfrozeDate": "date",
    "RepurchaseAmount": "money",
    "HighestTradingPrice": "money",
    "LowestTradingPrice": "money",
    "AveragePrice": "money",
}


# role → coarse entity type for the no-model (dictionary+regex) tagger:
# regex types from FIELD2REGEX_TYPE plus named-entity classes. Used by the
# decoders' compatibility matching when the tagger supplies types rather
# than exact roles (analog of ann_mspan2guess_field being a *guess*,
# dee/helper/dee.py:120).
ROLE_COARSE_TYPE: dict[str, str] = {
    **FIELD2REGEX_TYPE,
    "EquityHolder": "person",
    "Pledger": "person",
    "Pledgee": "company",
    "CompanyName": "company",
    "LegalInstitution": "institution",
}


def get_event_template(name: str) -> tuple[EventType, ...]:
    """Catalog selection by name — the analog of the reference's
    ``get_event_template`` (dee/event_types/__init__.py): templates are
    data, selected per run.  Accepts the reference template module names
    and short aliases."""
    key = name.lower()
    if key in ("zheng2019_trigger_graph", "chfinann", "zheng2019"):
        return CHFINANN_EVENT_TYPES
    if key in ("wikievents_w_tgg", "wikievents"):
        from .catalogs import WIKIEVENTS_EVENT_TYPES

        return WIKIEVENTS_EVENT_TYPES
    raise ValueError(
        f"unknown event template {name!r} "
        "(known: zheng2019_trigger_graph/chfinann, wikievents_w_tgg/wikievents)"
    )


def all_entity_fields(event_types: tuple[EventType, ...] = CHFINANN_EVENT_TYPES) -> list[str]:
    """Union of common fields and event roles, insertion-ordered &
    deduplicated — the entity-label universe (dee/helper/dee.py:204-214)."""
    seen: dict[str, None] = {}
    for f in COMMON_FIELDS:
        seen.setdefault(f, None)
    for et in event_types:
        for f in et.fields:
            seen.setdefault(f, None)
    return list(seen)


def bio_labels(event_types: tuple[EventType, ...] = CHFINANN_EVENT_TYPES) -> list[str]:
    """['O', 'B-X', 'I-X', ...] — B at odd index, I at even (dee.py:215-220)."""
    labels = ["O"]
    for f in all_entity_fields(event_types):
        labels.append("B-" + f)
        labels.append("I-" + f)
    return labels


def label_index(event_types: tuple[EventType, ...] = CHFINANN_EVENT_TYPES) -> dict[str, int]:
    return {lab: i for i, lab in enumerate(bio_labels(event_types))}


def catalog_as_rows(event_types: tuple[EventType, ...] = CHFINANN_EVENT_TYPES):
    """Catalog as plain rows for a broadcast-able Spark dimension table."""
    return [
        {
            "event_type": et.name,
            "fields": list(et.fields),
            "min_field_num": et.min_field_num,
            "key_fields": list(et.key_fields),
        }
        for et in event_types
    ]


# Truncation knobs. The reference caps at 128/64 (dee/tasks/dee_task.py:
# 60-61) because its BERT encoder needs fixed shapes; this engine has no
# such model boundary — the caps only bound Arrow-batch memory in the UDF
# stages, so they default higher. Enforced with counters, never silently
# (SURVEY §2.2 T8 / A9).
MAX_SENT_LEN = 512
MAX_SENT_NUM = 256
# Path cap for EDAG expansion on adversarial documents (SURVEY §7 risk 2).
MAX_EDAG_PATHS = 1024
