"""Declarative YAML job configs for the ``scripts/run_*_job.py``
entry points — reference parity for FastIE's config-file surface
(``fastie/hparams/parser.py:26-43``: a single ``config.yaml`` argv is
parsed as the full argument set; ``fastie/cli.py:48-55`` dispatches on
it; ``examples/*/*.yaml`` are the user-facing artifacts).

Design: the YAML mapping is translated into an argv list and fed to
the SAME argparse parser the flags use, so the two surfaces share one
schema, one set of defaults, and one help text — a yaml key
``batch_size: 64`` is exactly ``--batch-size 64``. Booleans map to
store_true flags (present-if-true), lists to repeated values, null to
flag omission. Example configs live in ``examples/*.yaml``.
"""

from __future__ import annotations

import sys
from typing import Sequence


def yaml_to_argv(path: str) -> list[str]:
    """Translate a YAML mapping into an argparse argv list
    (``some_key: v`` → ``--some-key v``)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"{path}: job config must be a YAML mapping")
    argv: list[str] = []
    for k, v in cfg.items():
        flag = "--" + str(k).replace("_", "-")
        if v is None:
            continue
        if isinstance(v, bool):
            if v:
                argv.append(flag)
        elif isinstance(v, (list, tuple)):
            argv.append(flag)
            argv.extend(str(x) for x in v)
        else:
            argv.extend([flag, str(v)])
    return argv


def job_argv(argv: Sequence[str] | None = None) -> list[str] | None:
    """The reference's dispatch rule: when the entire command line is
    one ``*.yaml``/``*.yml`` path, parse the file as the full argument
    set; otherwise return None and let argparse read the real argv."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) == 1 and argv[0].endswith((".yaml", ".yml")):
        return yaml_to_argv(argv[0])
    return None
