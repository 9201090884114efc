"""WikiEvents (KAIROS) + DuEE-fin event-schema catalogs — transcribed
schema DATA.

Role inventories, pseudo-trigger tiers and min-field counts as defined
by the reference templates ``dee/event_types/wikievents_w_tgg.py`` and
``dee/event_types/dueefin_w_tgg.py`` (event_type_fields_list). For
WikiEvents: FIELDS == TRIGGERS['all'], common_fields=[], min_field_num=1
for every type. The string 'all' tier is omitted: it always equals
``fields``, which this engine uses directly when num_triggers covers
every role. Machine-extracted from the templates' class constants —
data transcription, not code; each catalog is equality-diffed against
its template in the fidelity suites (test_wikievents_fidelity.py,
test_duee_fidelity.py).
"""

from __future__ import annotations

from .config import EventType

WIKIEVENTS_EVENT_TYPES: tuple[EventType, ...] = (
    EventType(
        'Cognitive.IdentifyCategorize.Unspecified',
        ('Trigger', 'Identifier', 'IdentifiedObject', 'IdentifiedRole', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('IdentifiedObject', 'Trigger'),
            3: ('IdentifiedObject', 'Identifier', 'Trigger'),
            4: ('IdentifiedObject', 'Identifier', 'Place', 'Trigger'),
            5: ('IdentifiedObject', 'IdentifiedRole', 'Identifier', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Cognitive.Inspection.SensoryObserve',
        ('Trigger', 'Observer', 'ObservedEntity', 'Place', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Observer', 'Trigger'),
            3: ('Instrument', 'Observer', 'Trigger'),
            4: ('Instrument', 'ObservedEntity', 'Observer', 'Trigger'),
            5: ('Instrument', 'ObservedEntity', 'Observer', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Conflict.Attack.Unspecified',
        ('Trigger', 'Target', 'Attacker', 'Place', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Target', 'Trigger'),
            3: ('Place', 'Target', 'Trigger'),
            4: ('Attacker', 'Place', 'Target', 'Trigger'),
            5: ('Attacker', 'Instrument', 'Place', 'Target', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Life.Injure.Unspecified',
        ('Trigger', 'Victim', 'Injurer', 'Instrument', 'BodyPart'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', 'Victim'),
            3: ('Instrument', 'Trigger', 'Victim'),
            4: ('Injurer', 'Instrument', 'Trigger', 'Victim'),
            5: ('BodyPart', 'Injurer', 'Instrument', 'Trigger', 'Victim'),
        },
        min_field_num=1,
    ),
    EventType(
        'Conflict.Attack.DetonateExplode',
        ('Trigger', 'Place', 'Target', 'ExplosiveDevice', 'Attacker', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Place', 'Trigger'),
            3: ('Place', 'Target', 'Trigger'),
            4: ('Attacker', 'Place', 'Target', 'Trigger'),
            5: ('Attacker', 'ExplosiveDevice', 'Place', 'Target', 'Trigger'),
            6: ('Attacker', 'ExplosiveDevice', 'Instrument', 'Place', 'Target', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.ChargeIndict.Unspecified',
        ('Trigger', 'Defendant', 'Prosecutor', 'JudgeCourt', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Defendant', 'Trigger'),
            3: ('Defendant', 'Place', 'Trigger'),
            4: ('Defendant', 'Place', 'Prosecutor', 'Trigger'),
            5: ('Defendant', 'JudgeCourt', 'Place', 'Prosecutor', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.ArrestJailDetain.Unspecified',
        ('Trigger', 'Detainee', 'Jailer', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Detainee', 'Trigger'),
            3: ('Detainee', 'Jailer', 'Trigger'),
            4: ('Detainee', 'Jailer', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.Convict.Unspecified',
        ('Trigger', 'Defendant', 'JudgeCourt'),
        triggers={
            1: ('Trigger',),
            2: ('Defendant', 'Trigger'),
            3: ('Defendant', 'JudgeCourt', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.InvestigateCrime.Unspecified',
        ('Trigger', 'Investigator', 'Defendant', 'Place', 'Observer', 'ObservedEntity'),
        triggers={
            1: ('Trigger',),
            2: ('Investigator', 'Trigger'),
            3: ('Defendant', 'Investigator', 'Trigger'),
            4: ('Defendant', 'Investigator', 'Place', 'Trigger'),
            5: ('Defendant', 'Investigator', 'Observer', 'Place', 'Trigger'),
            6: ('Defendant', 'Investigator', 'ObservedEntity', 'Observer', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.Contact.Unspecified',
        ('Participant', 'Trigger', 'Topic', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Participant', 'Trigger'),
            3: ('Participant', 'Topic', 'Trigger'),
            4: ('Participant', 'Place', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Life.Die.Unspecified',
        ('Victim', 'Trigger', 'Killer', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', 'Victim'),
            3: ('Killer', 'Trigger', 'Victim'),
            4: ('Killer', 'Place', 'Trigger', 'Victim'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.DamageDestroyDisableDismantle.Damage',
        ('Trigger', 'Artifact', 'Place', 'Instrument', 'Damager'),
        triggers={
            1: ('Trigger',),
            2: ('Artifact', 'Trigger'),
            3: ('Artifact', 'Place', 'Trigger'),
            4: ('Artifact', 'Instrument', 'Place', 'Trigger'),
            5: ('Artifact', 'Damager', 'Instrument', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Control.ImpedeInterfereWith.Unspecified',
        ('Trigger', 'Impeder', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Impeder', 'Trigger'),
            3: ('Impeder', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'GenericCrime.GenericCrime.GenericCrime',
        ('Trigger', 'Perpetrator', 'Victim', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Perpetrator', 'Trigger'),
            3: ('Perpetrator', 'Trigger', 'Victim'),
            4: ('Perpetrator', 'Place', 'Trigger', 'Victim'),
        },
        min_field_num=1,
    ),
    EventType(
        'Movement.Transportation.Unspecified',
        ('Trigger', 'Destination', 'PassengerArtifact', 'Transporter', 'Vehicle', 'Origin'),
        triggers={
            1: ('Trigger',),
            2: ('PassengerArtifact', 'Trigger'),
            3: ('Destination', 'PassengerArtifact', 'Trigger'),
            4: ('Destination', 'PassengerArtifact', 'Trigger', 'Vehicle'),
            5: ('Destination', 'PassengerArtifact', 'Transporter', 'Trigger', 'Vehicle'),
            6: ('Destination', 'Origin', 'PassengerArtifact', 'Transporter', 'Trigger', 'Vehicle'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.Contact.Broadcast',
        ('Communicator', 'Trigger', 'Topic', 'Recipient', 'Place', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Communicator', 'Trigger'),
            3: ('Communicator', 'Topic', 'Trigger'),
            4: ('Communicator', 'Place', 'Topic', 'Trigger'),
            5: ('Communicator', 'Place', 'Recipient', 'Topic', 'Trigger'),
            6: ('Communicator', 'Instrument', 'Place', 'Recipient', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.DamageDestroyDisableDismantle.Destroy',
        ('Trigger', 'Artifact', 'Destroyer', 'Place', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Artifact', 'Trigger'),
            3: ('Artifact', 'Destroyer', 'Trigger'),
            4: ('Artifact', 'Destroyer', 'Instrument', 'Trigger'),
            5: ('Artifact', 'Destroyer', 'Instrument', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Medical.Intervention.Unspecified',
        ('Trigger', 'Patient', 'Treater', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Patient', 'Trigger'),
            3: ('Patient', 'Treater', 'Trigger'),
            4: ('Patient', 'Place', 'Treater', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Conflict.Demonstrate.DemonstrateWithViolence',
        ('Trigger', 'Demonstrator', 'Regulator'),
        triggers={
            1: ('Trigger',),
            2: ('Regulator', 'Trigger'),
            3: ('Demonstrator', 'Regulator', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Conflict.Demonstrate.Unspecified',
        ('Trigger', 'Demonstrator', 'Target', 'Topic'),
        triggers={
            1: ('Trigger',),
            2: ('Target', 'Trigger'),
            3: ('Target', 'Topic', 'Trigger'),
            4: ('Demonstrator', 'Target', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.ThreatenCoerce.Unspecified',
        ('Trigger', 'Recipient', 'Communicator'),
        triggers={
            1: ('Trigger',),
            2: ('Recipient', 'Trigger'),
            3: ('Communicator', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.RequestCommand.Broadcast',
        ('Trigger', 'Communicator', 'Recipient'),
        triggers={
            1: ('Trigger',),
            2: ('Recipient', 'Trigger'),
            3: ('Communicator', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.Contact.Meet',
        ('Trigger', 'Participant', 'Place', 'Topic'),
        triggers={
            1: ('Trigger',),
            2: ('Participant', 'Trigger'),
            3: ('Participant', 'Place', 'Trigger'),
            4: ('Participant', 'Place', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Movement.Transportation.Evacuation',
        ('Trigger', 'PassengerArtifact', 'Origin', 'Transporter', 'Destination'),
        triggers={
            1: ('Trigger',),
            2: ('PassengerArtifact', 'Trigger'),
            3: ('PassengerArtifact', 'Transporter', 'Trigger'),
            4: ('Origin', 'PassengerArtifact', 'Transporter', 'Trigger'),
            5: ('Destination', 'Origin', 'PassengerArtifact', 'Transporter', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.Acquit.Unspecified',
        ('Trigger', 'Defendant'),
        triggers={
            1: ('Trigger',),
            2: ('Defendant', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.ManufactureAssemble.Unspecified',
        ('Trigger', 'Artifact', 'Components', 'ManufacturerAssembler', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Components', 'Trigger'),
            3: ('Artifact', 'Components', 'Trigger'),
            4: ('Artifact', 'Components', 'Place', 'Trigger'),
            5: ('Artifact', 'Components', 'ManufacturerAssembler', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.DamageDestroyDisableDismantle.Dismantle',
        ('Trigger', 'Artifact', 'Instrument', 'Components', 'Place', 'Dismantler'),
        triggers={
            1: ('Trigger',),
            2: ('Instrument', 'Trigger'),
            3: ('Dismantler', 'Instrument', 'Trigger'),
            4: ('Dismantler', 'Instrument', 'Place', 'Trigger'),
            5: ('Components', 'Dismantler', 'Instrument', 'Place', 'Trigger'),
            6: ('Artifact', 'Components', 'Dismantler', 'Instrument', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.Sentence.Unspecified',
        ('Trigger', 'Defendant', 'JudgeCourt', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('JudgeCourt', 'Trigger'),
            3: ('Defendant', 'JudgeCourt', 'Trigger'),
            4: ('Defendant', 'JudgeCourt', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.TrialHearing.Unspecified',
        ('Trigger', 'Defendant', 'JudgeCourt', 'Place', 'Prosecutor'),
        triggers={
            1: ('Trigger',),
            2: ('JudgeCourt', 'Trigger'),
            3: ('Defendant', 'JudgeCourt', 'Trigger'),
            4: ('Defendant', 'JudgeCourt', 'Place', 'Trigger'),
            5: ('Defendant', 'JudgeCourt', 'Place', 'Prosecutor', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Transaction.ExchangeBuySell.Unspecified',
        ('Trigger', 'AcquiredEntity', 'Giver', 'Recipient', 'PaymentBarter'),
        triggers={
            1: ('Trigger',),
            2: ('AcquiredEntity', 'Trigger'),
            3: ('AcquiredEntity', 'Giver', 'Trigger'),
            4: ('AcquiredEntity', 'Giver', 'Recipient', 'Trigger'),
            5: ('AcquiredEntity', 'Giver', 'PaymentBarter', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Movement.Transportation.PreventPassage',
        ('Trigger', 'Destination', 'Preventer', 'Vehicle', 'Transporter', 'Origin', 'PassengerArtifact'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', 'Vehicle'),
            3: ('Preventer', 'Trigger', 'Vehicle'),
            4: ('Preventer', 'Transporter', 'Trigger', 'Vehicle'),
            5: ('Destination', 'Preventer', 'Transporter', 'Trigger', 'Vehicle'),
            6: ('Destination', 'PassengerArtifact', 'Preventer', 'Transporter', 'Trigger', 'Vehicle'),
            7: ('Destination', 'Origin', 'PassengerArtifact', 'Preventer', 'Transporter', 'Trigger', 'Vehicle'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.Contact.Correspondence',
        ('Participant', 'Trigger', 'Topic', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Participant', 'Trigger'),
            3: ('Participant', 'Topic', 'Trigger'),
            4: ('Participant', 'Place', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.ThreatenCoerce.Broadcast',
        ('Trigger', 'Recipient', 'Communicator'),
        triggers={
            1: ('Trigger',),
            2: ('Recipient', 'Trigger'),
            3: ('Communicator', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.RequestCommand.Unspecified',
        ('Trigger', 'Recipient', 'Communicator', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Communicator', 'Trigger'),
            3: ('Communicator', 'Place', 'Trigger'),
            4: ('Communicator', 'Place', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Conflict.Defeat.Unspecified',
        ('Victor', 'Trigger', 'Defeated', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', 'Victor'),
            3: ('Defeated', 'Trigger', 'Victor'),
            4: ('Defeated', 'Place', 'Trigger', 'Victor'),
        },
        min_field_num=1,
    ),
    EventType(
        'Life.Infect.Unspecified',
        ('Trigger', 'Victim'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', 'Victim'),
        },
        min_field_num=1,
    ),
    EventType(
        'Cognitive.Research.Unspecified',
        ('Trigger', 'Subject', 'Researcher', 'Place'),
        triggers={
            1: ('Trigger',),
            2: ('Researcher', 'Trigger'),
            3: ('Place', 'Researcher', 'Trigger'),
            4: ('Place', 'Researcher', 'Subject', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Disaster.Crash.Unspecified',
        ('Trigger', 'CrashObject', 'Place', 'Vehicle'),
        triggers={
            1: ('Trigger',),
            2: ('Place', 'Trigger'),
            3: ('CrashObject', 'Place', 'Trigger'),
            4: ('CrashObject', 'Place', 'Trigger', 'Vehicle'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.DamageDestroyDisableDismantle.Unspecified',
        ('Artifact', 'Trigger', 'DamagerDestroyer', 'Place', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Artifact', 'Trigger'),
            3: ('Artifact', 'Instrument', 'Trigger'),
            4: ('Artifact', 'DamagerDestroyer', 'Instrument', 'Trigger'),
            5: ('Artifact', 'DamagerDestroyer', 'Instrument', 'Place', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Movement.Transportation.IllegalTransportation',
        ('Trigger', 'Destination', 'PassengerArtifact', 'Vehicle', 'Transporter'),
        triggers={
            1: ('Trigger',),
            2: ('Destination', 'Trigger'),
            3: ('Destination', 'PassengerArtifact', 'Trigger'),
            4: ('Destination', 'PassengerArtifact', 'Transporter', 'Trigger'),
            5: ('Destination', 'PassengerArtifact', 'Transporter', 'Trigger', 'Vehicle'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.ThreatenCoerce.Correspondence',
        ('Communicator', 'Trigger', 'Recipient'),
        triggers={
            1: ('Trigger',),
            2: ('Communicator', 'Trigger'),
            3: ('Communicator', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Personnel.EndPosition.Unspecified',
        ('Trigger', 'Employee', 'PlaceOfEmployment'),
        triggers={
            1: ('Trigger',),
            2: ('Employee', 'Trigger'),
            3: ('Employee', 'PlaceOfEmployment', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'ArtifactExistence.DamageDestroyDisableDismantle.DisableDefuse',
        ('Trigger', 'Artifact', 'Disabler', 'Instrument'),
        triggers={
            1: ('Trigger',),
            2: ('Instrument', 'Trigger'),
            3: ('Disabler', 'Instrument', 'Trigger'),
            4: ('Artifact', 'Disabler', 'Instrument', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Personnel.StartPosition.Unspecified',
        ('Trigger', 'Employee', 'Position', 'Place', 'PlaceOfEmployment'),
        triggers={
            1: ('Trigger',),
            2: ('Position', 'Trigger'),
            3: ('Employee', 'Position', 'Trigger'),
            4: ('Employee', 'Place', 'Position', 'Trigger'),
            5: ('Employee', 'Place', 'PlaceOfEmployment', 'Position', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Cognitive.TeachingTrainingLearning.Unspecified',
        ('Trigger', 'Learner', 'TeacherTrainer'),
        triggers={
            1: ('Trigger',),
            2: ('Learner', 'Trigger'),
            3: ('Learner', 'TeacherTrainer', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Justice.ReleaseParole.Unspecified',
        ('Trigger', 'Defendant', 'JudgeCourt'),
        triggers={
            1: ('Trigger',),
            2: ('Defendant', 'Trigger'),
            3: ('Defendant', 'JudgeCourt', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Transaction.Donation.Unspecified',
        ('ArtifactMoney', 'Recipient', 'Trigger', 'Giver'),
        triggers={
            1: ('Trigger',),
            2: ('ArtifactMoney', 'Trigger'),
            3: ('ArtifactMoney', 'Giver', 'Trigger'),
            4: ('ArtifactMoney', 'Giver', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Disaster.DiseaseOutbreak.Unspecified',
        ('Trigger', 'Place', 'Victim', 'Disease'),
        triggers={
            1: ('Trigger',),
            2: ('Place', 'Trigger'),
            3: ('Place', 'Trigger', 'Victim'),
            4: ('Disease', 'Place', 'Trigger', 'Victim'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.RequestCommand.Meet',
        ('Trigger', 'Recipient', 'Communicator'),
        triggers={
            1: ('Trigger',),
            2: ('Recipient', 'Trigger'),
            3: ('Communicator', 'Recipient', 'Trigger'),
        },
        min_field_num=1,
    ),
    EventType(
        'Contact.RequestCommand.Correspondence',
        ('Topic', 'Recipient', 'Trigger', 'Communicator'),
        triggers={
            1: ('Trigger',),
            2: ('Topic', 'Trigger'),
            3: ('Recipient', 'Topic', 'Trigger'),
            4: ('Communicator', 'Recipient', 'Topic', 'Trigger'),
        },
        min_field_num=1,
    ),
)


# DuEE-fin (baidu DuEE financial subset) event-schema catalog — transcribed
# schema DATA from the reference template ``dee/event_types/dueefin_w_tgg.py``
# (event_type_fields_list; min_field_num=2 for every type,
# common_fields=["OtherType"]). The 'all' trigger tier is omitted as in the
# WikiEvents catalog above. Machine-extracted from the template's class
# constants — data transcription, not code.
DUEEFIN_COMMON_FIELDS: tuple[str, ...] = ("OtherType",)

DUEEFIN_EVENT_TYPES: tuple[EventType, ...] = (
    EventType(
        '质押',
        ('Trigger', '质押物占总股比', '质权方', '质押方', '事件时间', '质押股票/股份数量', '质押物所属公司', '质押物', '质押物占持股比', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '质押股票/股份数量'),
            3: ('Trigger', '事件时间', '质押股票/股份数量'),
            4: ('Trigger', '事件时间', '质押物占持股比', '质押股票/股份数量'),
            5: ('Trigger', '质押物占总股比', '质押物占持股比', '质押股票/股份数量', '质权方'),
            6: ('Trigger', '质押方', '质押物占总股比', '质押物占持股比', '质押股票/股份数量', '质权方'),
            7: ('Trigger', '事件时间', '质押方', '质押物占总股比', '质押物占持股比', '质押股票/股份数量', '质权方'),
            8: ('Trigger', '事件时间', '质押方', '质押物占总股比', '质押物占持股比', '质押物所属公司', '质押股票/股份数量', '质权方'),
            9: ('Trigger', '事件时间', '质押方', '质押物', '质押物占总股比', '质押物占持股比', '质押物所属公司', '质押股票/股份数量', '质权方'),
        },
        min_field_num=2,
    ),
    EventType(
        '股份回购',
        ('Trigger', '每股交易价格', '交易金额', '回购完成时间', '回购股份数量', '占公司总股本比例', '回购方', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '回购完成时间'),
            3: ('Trigger', '交易金额', '回购完成时间'),
            4: ('Trigger', '交易金额', '回购完成时间', '每股交易价格'),
            5: ('Trigger', '交易金额', '回购完成时间', '回购股份数量', '每股交易价格'),
            6: ('Trigger', '交易金额', '占公司总股本比例', '回购完成时间', '回购股份数量', '每股交易价格'),
            7: ('Trigger', '交易金额', '占公司总股本比例', '回购完成时间', '回购方', '回购股份数量', '每股交易价格'),
            8: ('Trigger', '交易金额', '占公司总股本比例', '回购完成时间', '回购方', '回购股份数量', '披露时间', '每股交易价格'),
        },
        min_field_num=2,
    ),
    EventType(
        '解除质押',
        ('Trigger', '质权方', '质押物占总股比', '质押方', '事件时间', '质押股票/股份数量', '质押物所属公司', '质押物', '质押物占持股比', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '事件时间'),
            3: ('Trigger', '事件时间', '质权方'),
            4: ('Trigger', '事件时间', '披露时间', '质权方'),
            5: ('Trigger', '事件时间', '披露时间', '质押物占总股比', '质权方'),
            6: ('Trigger', '事件时间', '披露时间', '质押方', '质押物占总股比', '质权方'),
            7: ('Trigger', '事件时间', '披露时间', '质押方', '质押物占总股比', '质押股票/股份数量', '质权方'),
            8: ('Trigger', '事件时间', '披露时间', '质押方', '质押物占总股比', '质押物所属公司', '质押股票/股份数量', '质权方'),
            9: ('Trigger', '事件时间', '披露时间', '质押方', '质押物', '质押物占总股比', '质押物所属公司', '质押股票/股份数量', '质权方'),
        },
        min_field_num=2,
    ),
    EventType(
        '被约谈',
        ('Trigger', '约谈机构', '被约谈时间', '披露时间', '公司名称'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '公司名称'),
            3: ('Trigger', '公司名称', '约谈机构'),
            4: ('Trigger', '公司名称', '约谈机构', '被约谈时间'),
            5: ('Trigger', '公司名称', '披露时间', '约谈机构', '被约谈时间'),
        },
        min_field_num=2,
    ),
    EventType(
        '企业收购',
        ('Trigger', '被收购方', '收购标的', '交易金额', '收购方', '收购完成时间', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '被收购方'),
            3: ('Trigger', '收购方', '被收购方'),
            4: ('Trigger', '交易金额', '收购方', '被收购方'),
            5: ('Trigger', '交易金额', '收购方', '收购标的', '被收购方'),
            6: ('Trigger', '交易金额', '收购完成时间', '收购方', '收购标的', '被收购方'),
            7: ('Trigger', '交易金额', '披露时间', '收购完成时间', '收购方', '收购标的', '被收购方'),
        },
        min_field_num=2,
    ),
    EventType(
        '股东增持',
        ('Trigger', '每股交易价格', '交易金额', '增持部分占所持比例', '交易完成时间', '增持方', '交易股票/股份数量', '增持部分占总股本比例', '股票简称', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '交易股票/股份数量'),
            3: ('Trigger', '交易股票/股份数量', '股票简称'),
            4: ('Trigger', '交易完成时间', '增持方', '股票简称'),
            5: ('Trigger', '交易完成时间', '交易金额', '增持方', '股票简称'),
            6: ('Trigger', '交易完成时间', '交易金额', '增持方', '每股交易价格', '股票简称'),
            7: ('Trigger', '交易完成时间', '交易金额', '增持方', '增持部分占所持比例', '每股交易价格', '股票简称'),
            8: ('Trigger', '交易完成时间', '交易股票/股份数量', '交易金额', '增持方', '增持部分占所持比例', '每股交易价格', '股票简称'),
            9: ('Trigger', '交易完成时间', '交易股票/股份数量', '交易金额', '增持方', '增持部分占总股本比例', '增持部分占所持比例', '每股交易价格', '股票简称'),
        },
        min_field_num=2,
    ),
    EventType(
        '高管变动',
        ('Trigger', '变动后职位', '任职公司', '高管姓名', '披露日期', '变动类型', '事件时间', '高管职位', '变动后公司名称'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '高管姓名'),
            3: ('Trigger', '变动类型', '高管姓名'),
            4: ('Trigger', '变动后职位', '变动类型', '高管姓名'),
            5: ('Trigger', '任职公司', '变动后职位', '变动类型', '高管姓名'),
            6: ('Trigger', '任职公司', '变动后职位', '变动类型', '披露日期', '高管姓名'),
            7: ('Trigger', '事件时间', '任职公司', '变动后职位', '变动类型', '披露日期', '高管姓名'),
            8: ('Trigger', '事件时间', '任职公司', '变动后职位', '变动类型', '披露日期', '高管姓名', '高管职位'),
            9: ('Trigger', '事件时间', '任职公司', '变动后公司名称', '变动后职位', '变动类型', '披露日期', '高管姓名', '高管职位'),
        },
        min_field_num=2,
    ),
    EventType(
        '中标',
        ('Trigger', '中标金额', '披露日期', '招标方', '中标日期', '中标标的', '中标公司'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '中标标的'),
            3: ('Trigger', '中标公司', '中标标的'),
            4: ('Trigger', '中标公司', '中标标的', '中标金额'),
            5: ('Trigger', '中标公司', '中标标的', '中标金额', '披露日期'),
            6: ('Trigger', '中标公司', '中标日期', '中标金额', '披露日期', '招标方'),
            7: ('Trigger', '中标公司', '中标日期', '中标标的', '中标金额', '披露日期', '招标方'),
        },
        min_field_num=2,
    ),
    EventType(
        '公司上市',
        ('Trigger', '募资金额', '事件时间', '证券代码', '环节', '发行价格', '上市公司', '披露时间', '市值'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '上市公司'),
            3: ('Trigger', '上市公司', '募资金额'),
            4: ('Trigger', '上市公司', '事件时间', '募资金额'),
            5: ('Trigger', '上市公司', '事件时间', '募资金额', '证券代码'),
            6: ('Trigger', '上市公司', '事件时间', '募资金额', '环节', '证券代码'),
            7: ('Trigger', '上市公司', '事件时间', '募资金额', '发行价格', '环节', '证券代码'),
            8: ('Trigger', '上市公司', '事件时间', '募资金额', '发行价格', '披露时间', '环节', '证券代码'),
            9: ('Trigger', '上市公司', '事件时间', '募资金额', '发行价格', '市值', '披露时间', '环节', '证券代码'),
        },
        min_field_num=2,
    ),
    EventType(
        '企业融资',
        ('Trigger', '融资金额', '事件时间', '被投资方', '领投方', '融资轮次', '披露时间', '投资方'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '融资金额'),
            3: ('Trigger', '事件时间', '融资金额'),
            4: ('Trigger', '事件时间', '披露时间', '融资金额'),
            5: ('Trigger', '事件时间', '披露时间', '融资金额', '被投资方'),
            6: ('Trigger', '事件时间', '披露时间', '融资金额', '被投资方', '领投方'),
            7: ('Trigger', '事件时间', '披露时间', '融资轮次', '融资金额', '被投资方', '领投方'),
            8: ('Trigger', '事件时间', '投资方', '披露时间', '融资轮次', '融资金额', '被投资方', '领投方'),
        },
        min_field_num=2,
    ),
    EventType(
        '亏损',
        ('Trigger', '亏损变化', '财报周期', '净亏损', '披露时间', '公司名称'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '净亏损'),
            3: ('Trigger', '亏损变化', '净亏损'),
            4: ('Trigger', '亏损变化', '净亏损', '财报周期'),
            5: ('Trigger', '亏损变化', '净亏损', '披露时间', '财报周期'),
            6: ('Trigger', '亏损变化', '公司名称', '净亏损', '披露时间', '财报周期'),
        },
        min_field_num=2,
    ),
    EventType(
        '股东减持',
        ('Trigger', '减持方', '每股交易价格', '交易金额', '减持部分占所持比例', '交易完成时间', '交易股票/股份数量', '减持部分占总股本比例', '股票简称', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '交易股票/股份数量'),
            3: ('Trigger', '交易股票/股份数量', '股票简称'),
            4: ('Trigger', '交易股票/股份数量', '减持部分占总股本比例', '股票简称'),
            5: ('Trigger', '交易完成时间', '交易股票/股份数量', '减持方', '股票简称'),
            6: ('Trigger', '交易完成时间', '交易股票/股份数量', '减持方', '每股交易价格', '股票简称'),
            7: ('Trigger', '交易完成时间', '交易股票/股份数量', '交易金额', '减持方', '每股交易价格', '股票简称'),
            8: ('Trigger', '交易完成时间', '交易股票/股份数量', '交易金额', '减持方', '减持部分占所持比例', '每股交易价格', '股票简称'),
            9: ('Trigger', '交易完成时间', '交易股票/股份数量', '交易金额', '减持方', '减持部分占总股本比例', '减持部分占所持比例', '每股交易价格', '股票简称'),
        },
        min_field_num=2,
    ),
    EventType(
        '企业破产',
        ('Trigger', '债务规模', '破产公司', '债权人', '破产时间', '披露时间'),
        triggers={
            1: ('Trigger',),
            2: ('Trigger', '破产公司'),
            3: ('Trigger', '债务规模', '破产公司'),
            4: ('Trigger', '债务规模', '债权人', '破产公司'),
            5: ('Trigger', '债务规模', '债权人', '破产公司', '破产时间'),
            6: ('Trigger', '债务规模', '债权人', '披露时间', '破产公司', '破产时间'),
        },
        min_field_num=2,
    ),
)
