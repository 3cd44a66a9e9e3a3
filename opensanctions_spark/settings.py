"""Compat ``zavod.settings`` subset: the runtime constants crawlers read
(``zavod/zavod/settings.py``). RUN_TIME is the engine's deterministic
run timestamp (model.melt.RUN_TIME parsed); service keys default None —
register the corresponding seam (HTTP fetcher / name cleaner /
translator) instead of setting a key."""

from __future__ import annotations

import os
from datetime import datetime
from pathlib import Path

from opensanctions_spark.model.melt import RUN_TIME as _RUN_TIME_STR

#: working-data root (``zavod/zavod/settings.py`` DATA_PATH: env override,
#: ``data/`` under the CWD otherwise) — the base for
#: ``opensanctions_spark.archive.dataset_data_path``
DATA_PATH: Path = Path(
    os.environ.get("OSP_DATA_PATH", os.path.join(os.getcwd(), "data"))
).resolve()

#: default statement-archive root — where ``store.get_store`` syncs from
#: when the caller names no archive (the reference reads its global
#: archive the same way)
ARCHIVE_PATH: Path = Path(
    os.environ.get("OSP_ARCHIVE_PATH", str(DATA_PATH / "archive"))
).resolve()

RUN_TIME: datetime = datetime.fromisoformat(_RUN_TIME_STR[:19])
RUN_TIME_ISO: str = _RUN_TIME_STR

#: third-party service keys — intentionally None: this engine routes
#: external services through registered seams, not env keys
OPENAI_API_KEY: str | None = None
ZYTE_API_KEY: str | None = None
