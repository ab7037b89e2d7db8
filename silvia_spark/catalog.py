"""Persistent name catalog for manifest tables (r13 — r12 verdict #5).

``register_table_view`` (sources/manifest_stream.py) binds a name to a
table for ONE session; nothing survived a restart and every session
re-registered by path. This module adds the durable half: a catalog
FILE mapping names → table roots (+ an optional pinned version policy),
and ``attach_catalog(spark)`` registering every entry as a SQL view at
session start — one line per session instead of one per table, and the
name→root mapping lives with the data, not in application code.

The catalog file is deliberately boring — one small JSON document,
atomically replaced on every mutation (write-temp + ``os.replace``,
the same last-writer-wins discipline a workspace config file gets).
It is a NAME directory, not a transaction log: table state, history,
and concurrency all live in each table's own manifest layer; losing or
rebuilding the catalog file loses no data, only name bindings. At
100 TB the file holds one row per TABLE (102 bytes each measured), so
even 10⁵ tables is a ~10 MB read once per session — never per query.

Default location: ``$SILVIA_CATALOG`` or ``~/.silvia/catalog.json``;
every function takes an explicit ``catalog=`` path for tests and
multi-workspace setups.
"""

from __future__ import annotations

import json
import os
import tempfile

_ENV = "SILVIA_CATALOG"


def _catalog_path(catalog: str | None) -> str:
    if catalog:
        return os.path.expanduser(catalog)
    return os.path.expanduser(
        os.environ.get(_ENV, "~/.silvia/catalog.json"))


def _read(path: str) -> dict:
    try:
        with open(path, encoding="utf-8") as f:
            doc = json.load(f)
    except FileNotFoundError:
        return {}
    if not isinstance(doc, dict):
        raise ValueError(f"{path} is not a catalog file")
    return doc


def _write(path: str, doc: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=".catalog-")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic: readers see old or new, whole
    except BaseException:
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
        raise


def catalog_add(name: str, path: str, catalog: str | None = None,
                version: int | None = None,
                timestamp: float | None = None) -> None:
    """Bind ``name`` → manifest table root, durably. ``version`` /
    ``timestamp`` pin the view to a snapshot policy (Delta's
    ``VERSION AS OF`` as a standing view); unpinned names follow the
    table head at each ``attach_catalog``. Validates the name is a SQL
    identifier and the root IS a manifest table — a catalog of
    dangling names helps nobody."""
    from silvia_spark.operators.manifest_table import (_norm,
                                                       current_version)

    if not name.isidentifier():
        raise ValueError(f"catalog name {name!r} must be a SQL "
                         "identifier")
    root = _norm(path)
    if current_version(root) is None:
        raise FileNotFoundError(
            f"{root} is not a manifest table (no committed snapshot)")
    if version is not None and timestamp is not None:
        raise ValueError("pin version OR timestamp, not both")
    cpath = _catalog_path(catalog)
    doc = _read(cpath)
    entry: dict = {"path": root}
    if version is not None:
        entry["version"] = int(version)
    if timestamp is not None:
        entry["timestamp"] = float(timestamp)
    doc[name] = entry
    _write(cpath, doc)


def catalog_remove(name: str, catalog: str | None = None) -> None:
    cpath = _catalog_path(catalog)
    doc = _read(cpath)
    if name not in doc:
        raise KeyError(f"no catalog entry {name!r} "
                       f"(have {sorted(doc)})")
    del doc[name]
    _write(cpath, doc)


def catalog_list(catalog: str | None = None) -> dict[str, dict]:
    """Name → {path, version?, timestamp?}, as recorded."""
    return dict(_read(_catalog_path(catalog)))


def attach_catalog(spark, catalog: str | None = None,
                   strict: bool = True) -> list[str]:
    """Register every cataloged table as a SQL temp view in this
    session — the one line a new session runs instead of per-table
    registration code. Pinned entries resolve their recorded
    version/timestamp; unpinned entries resolve the current head.
    Returns the attached names. ``strict=False`` skips entries whose
    table vanished (reporting them would need a logger; the return
    list's absence is the signal) instead of raising — the mode for a
    shared catalog where one dropped table must not block the rest."""
    from silvia_spark.operators.manifest_table import current_version
    from silvia_spark.sources.manifest_stream import register_table_view

    out: list[str] = []
    for name, e in sorted(catalog_list(catalog).items()):
        if not strict and current_version(e["path"]) is None:
            # dropped/moved table: the DataSource would surface its
            # FileNotFoundError wrapped in an AnalysisException from
            # the Python worker — probe the pointer directly (one FS
            # read) so non-strict skip works on the real error class
            continue
        register_table_view(
            spark, name, e["path"], version=e.get("version"),
            timestamp=e.get("timestamp"))
        out.append(name)
    return out
