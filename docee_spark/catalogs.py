"""WikiEvents (KAIROS) event-schema catalog — transcribed schema DATA.

Role inventories, pseudo-trigger tiers and min-field counts as defined
by the reference template ``dee/event_types/wikievents_w_tgg.py``
(event_type_fields_list; FIELDS == TRIGGERS['all'], common_fields=[],
min_field_num=1 for every type). The string 'all' tier is omitted:
it always equals ``fields``, which this engine uses directly when
num_triggers covers every role. Machine-extracted from the template's
class constants — data transcription, not code.
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
