"""Image/text preprocessing (reference minigpt4/processors/).

Importing this package registers all processors.
"""

from myriad_tpu.processors.base_processor import BaseProcessor
from myriad_tpu.processors.blip_processors import (
    Blip2ImageEvalProcessor,
    Blip2ImageTrainProcessor,
    BlipCaptionProcessor,
    LocImageTrainProcessor,
)

__all__ = [
    "BaseProcessor",
    "BlipCaptionProcessor",
    "Blip2ImageTrainProcessor",
    "Blip2ImageEvalProcessor",
    "LocImageTrainProcessor",
]
