"""pyctcdecode_tpu — TPU-native CTC beam-search decoding framework.

A from-scratch JAX/XLA/Pallas framework with the full capability surface of
kensho-technologies/pyctcdecode: beam-search CTC decoding with n-gram
shallow fusion, hotword boosting, BPE and character alphabets, streaming
with exact state carry-over, frame-level word annotations, batch decoding,
and model serialization — plus a vectorized on-device decode engine that
shards utterance batches across TPU meshes.
"""
from .alphabet import Alphabet
from .api import build_ctcdecoder
from .decoder import Beam, BeamSearchDecoderCTC, LMBeam, OutputBeam
from .models import (
    AbstractLanguageModel,
    AbstractLMState,
    HotwordScorer,
    LanguageModel,
    MultiLanguageModel,
    NGramModel,
)
from .tpu_decoder import TPUBeamSearchDecoderCTC

__version__ = "0.1.0"

__all__ = [
    "Alphabet",
    "Beam",
    "BeamSearchDecoderCTC",
    "LMBeam",
    "OutputBeam",
    "AbstractLMState",
    "AbstractLanguageModel",
    "HotwordScorer",
    "LanguageModel",
    "MultiLanguageModel",
    "NGramModel",
    "TPUBeamSearchDecoderCTC",
    "build_ctcdecoder",
]
