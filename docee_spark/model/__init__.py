"""Batched numpy models for the pipeline's model slots (torch-free).

The container ships no deep-learning runtime, so the model slots are
filled by numpy analogs with the same *execution shape* as the reference
models: weights live in one artifact, are broadcast once, deserialized
once per executor process, and applied to Arrow batches — never per-row
Python. See char_tagger.CharTagger (M1, the NER slot).
"""

from .char_tagger import CharTagger, load_tagger, save_tagger, train_char_tagger

__all__ = ["CharTagger", "load_tagger", "save_tagger", "train_char_tagger"]
