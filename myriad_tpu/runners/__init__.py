"""Runners (reference minigpt4/runners/)."""

from myriad_tpu.runners.runner_base import RunnerBase

__all__ = ["RunnerBase"]
