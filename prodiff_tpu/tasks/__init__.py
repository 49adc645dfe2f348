"""Train-task registry (mirrors ``component/train_task/__init__.py``)."""

from __future__ import annotations

_TASKS = {}


def register_task(name: str):
    def deco(cls):
        _TASKS[name] = cls
        cls.task_name = name
        return cls

    return deco


def get_task_cls(name: str):
    # import task modules lazily so registration happens on demand; a broken
    # task module must raise, not degrade to "Unknown train task"
    from prodiff_tpu.tasks import svs  # noqa: F401
    from prodiff_tpu.tasks import dur_predictor  # noqa: F401
    from prodiff_tpu.tasks import pitch_predictor  # noqa: F401
    from prodiff_tpu.tasks import vari_predictor  # noqa: F401
    if name not in _TASKS:
        raise KeyError(f"Unknown train task {name!r}; known: {sorted(_TASKS)}")
    return _TASKS[name]
