"""Datasets & builders (reference minigpt4/datasets/).

Importing this package registers all dataset builders.
"""

from myriad_tpu.datasets import builders  # noqa: F401
