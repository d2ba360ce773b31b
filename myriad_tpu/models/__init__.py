"""Model zoo (reference minigpt4/models/).

Importing this package registers all model classes.  The reference's
__init__ imports seven modules that do not exist (SURVEY.md §2.8); only the
live models are provided here.
"""

from myriad_tpu.models.base import BaseModel

__all__ = ["BaseModel"]


def _register_all() -> None:
    # imported for registration side effects
    import importlib

    for mod in ("myriad", "mini_gpt4"):
        try:
            importlib.import_module(f"myriad_tpu.models.{mod}")
        except ModuleNotFoundError as e:  # pragma: no cover - build scaffolding
            if f"myriad_tpu.models.{mod}" not in str(e):
                raise


_register_all()
