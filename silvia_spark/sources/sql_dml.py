"""SQL MERGE/UPDATE/DELETE text entry points for manifest tables
(r14 — the r13 verdict's #1 and #9).

``INSERT INTO`` rides Spark's v2 write protocol (L34,
manifest_stream.ManifestInsertWriter), but Spark's Python DataSource
API exposes no row-level-operation hooks — a ``MERGE INTO`` statement
against a Python-DS catalog table fails in analysis before any plugin
code runs. So the DML verbs land as documented TEXT entry points:

    merge_into_sql(spark, "MERGE INTO t USING s ON t.k = s.k ...")
    update_sql(spark,     "UPDATE t SET v = v + 1 WHERE k < 10")
    delete_sql(spark,     "DELETE FROM t WHERE k < 10")

Each parses the standard statement form and routes into the manifest
layer's existing commit machinery — ``commit_merge``'s stats-pruned
file-granular copy-on-write for MERGE/UPDATE, ``commit_delete``'s
merge-on-read deletion vectors for DELETE — so SQL DML gets the exact
same semantics the Python API has: atomic single-flip commits, CHECK
constraints, CDF records, conflict detection, time travel.

Scope (loud refusals, never silent drift):

- ``ON`` must be a conjunction of equality predicates between a
  target and a source column (the file-granular rewrite plan prunes
  on key ranges; a non-equi ON has no key ranges to prune with).
- Assignments may not target the partition column or an ON key
  column: the committed anti-join removes replaced rows BY KEY, so a
  key- or partition-moving update would leave the old row behind.
  (Delta rewrites whole files and can move rows; this engine's
  keyed-merge plan cannot — refused, not approximated.)
- A target row matched by MORE than one source row raises (the SQL
  standard's nondeterministic-MERGE error). Enforced two-stage so the
  common case costs one aggregation over the SOURCE only; the target
  is consulted just when a duplicate source key actually exists.
- Keyword scanning is paren/quote-aware but not a full SQL grammar:
  a bare CASE WHEN inside a merge condition must be parenthesized
  (otherwise its WHEN/THEN would read as clause boundaries).

100 TB posture: the matched set is one shuffle join on the ON keys,
the not-matched sets are anti-joins on the same keys, and everything
downstream is commit_merge/commit_delete's pruned rewrite — cost is
O(source + touched files), never O(table).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["merge_into_sql", "update_sql", "delete_sql",
           "create_table_sql", "optimize_sql", "vacuum_sql",
           "describe_history_sql", "resolve_table_root"]


# --- top-level text scanning -------------------------------------------------
#
# MERGE grammar is regular enough that a full SQL parser would be
# padding: the only hard part is finding keywords/separators at paren
# depth 0 outside string/identifier quotes. _top_mask computes that
# once per statement; everything else is regex over masked positions.

def _top_mask(s: str) -> list[bool]:
    """mask[i] = True iff s[i] sits at paren depth 0 and outside
    '...', "..." and `...` quoting ('' escapes inside '...')."""
    mask = [False] * len(s)
    depth, q, i = 0, None, 0
    while i < len(s):
        c = s[i]
        if q is not None:
            if c == q:
                if q == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    i += 1  # doubled quote: stay inside the literal
                else:
                    q = None
        elif c in ("'", '"', "`"):
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in SQL at {i}: {s!r}")
        elif depth == 0:
            mask[i] = True
        i += 1
    if depth != 0 or q is not None:
        raise ValueError(f"unterminated {'quote' if q else 'paren'} "
                         f"in SQL: {s!r}")
    return mask


def _find_kw(s: str, mask: list[bool], kw: str,
             start: int = 0) -> int:
    """Index of the first top-level occurrence of keyword ``kw`` (a
    \\s+-joined word sequence) at/after ``start``, or -1."""
    pat = re.compile(r"\b" + r"\s+".join(kw.split()) + r"\b", re.I)
    for m in pat.finditer(s, start):
        if all(mask[i] for i in range(m.start(), m.end())):
            return m.start()
    return -1


def _split_top(s: str, mask: list[bool], sep: str) -> list[str]:
    """Split on top-level single-char separator ``sep``."""
    out, last = [], 0
    for i, c in enumerate(s):
        if c == sep and mask[i]:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return out


def _unquote_ident(t: str) -> str:
    t = t.strip()
    if t.startswith("`") and t.endswith("`"):
        return t[1:-1]
    return t


def _ref_and_alias(text: str) -> tuple[str, str | None]:
    """Parse '<ref> [AS] [alias]' where ref is an identifier, a
    backtick-quoted name/path, or a parenthesized subquery."""
    text = text.strip()
    if text.startswith("`"):
        end = text.index("`", 1)
        ref, rest = text[: end + 1], text[end + 1:]
    elif text.startswith("("):
        depth = 0
        for i, c in enumerate(text):  # quotes inside handled by the
            if c == "(":              # caller's top-level split: a
                depth += 1            # source subquery arrives whole
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        ref, rest = text[: i + 1], text[i + 1:]
    else:
        parts = text.split(None, 1)
        ref, rest = parts[0], parts[1] if len(parts) > 1 else ""
    words = rest.split()
    if words and words[0].upper() == "AS":
        words = words[1:]
    if len(words) > 1:
        raise ValueError(f"cannot parse table reference: {text!r}")
    return ref, (_unquote_ident(words[0]) if words else None)


# --- statement parsing ---------------------------------------------------------

_MATCH_HEAD = re.compile(
    r"^\s*(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+BY\s+(?P<by>TARGET|SOURCE))?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s*$",
    re.I | re.S)


def _parse_assignments(text: str) -> dict[str, str] | str:
    """'SET a = e, b = f' body → {col: expr_sql}; 'SET *' → '*'."""
    text = text.strip()
    if text == "*":
        return "*"
    mask = _top_mask(text)
    out: dict[str, str] = {}
    for piece in _split_top(text, mask, ","):
        pm = _top_mask(piece)
        eq = next((i for i, c in enumerate(piece)
                   if c == "=" and pm[i]), -1)
        if eq < 0:
            raise ValueError(f"cannot parse assignment: {piece!r}")
        lhs = _unquote_ident(piece[:eq])
        if "." in lhs:
            lhs = _unquote_ident(lhs.rsplit(".", 1)[1])
        if lhs in out:
            raise ValueError(f"column {lhs!r} assigned twice")
        out[lhs] = piece[eq + 1:].strip()
    if not out:
        raise ValueError("empty SET list")
    return out


def _parse_insert(text: str):
    """'INSERT ...' action body → '*' or (cols, value_exprs)."""
    text = text.strip()
    if text == "*":
        return "*"
    m = re.match(r"^\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                 text, re.I | re.S)
    if not m:
        raise ValueError(f"cannot parse INSERT action: INSERT {text!r}"
                         " (expected INSERT * or INSERT (cols) "
                         "VALUES (exprs))")
    cols = [_unquote_ident(c) for c in m.group("cols").split(",")]
    vals_text = m.group("vals")
    vals = [v.strip()
            for v in _split_top(vals_text, _top_mask(vals_text), ",")]
    if len(cols) != len(vals):
        raise ValueError(f"INSERT column/value count mismatch: "
                         f"{len(cols)} vs {len(vals)}")
    return cols, vals


class _MergeSpec:
    __slots__ = ("target", "target_alias", "source", "source_alias",
                 "on_sql", "matched", "not_matched", "by_source")

    def __init__(self):
        self.matched = []      # (cond|None, 'update'|'delete', payload)
        self.not_matched = []  # (cond|None, '*' | (cols, vals))
        self.by_source = []    # (cond|None, 'update'|'delete', payload)


def parse_merge(sql: str) -> _MergeSpec:
    sql = sql.strip().rstrip(";")
    mask = _top_mask(sql)
    if not re.match(r"\s*MERGE\s+INTO\b", sql, re.I):
        raise ValueError("not a MERGE INTO statement")
    head_end = _find_kw(sql, mask, "INTO") + 4
    i_using = _find_kw(sql, mask, "USING", head_end)
    i_on = _find_kw(sql, mask, "ON", i_using)
    i_when = _find_kw(sql, mask, "WHEN", i_on)
    if min(i_using, i_on, i_when) < 0:
        raise ValueError("MERGE needs USING, ON and at least one "
                         "WHEN clause")
    spec = _MergeSpec()
    spec.target, spec.target_alias = _ref_and_alias(
        sql[head_end:i_using])
    spec.source, spec.source_alias = _ref_and_alias(
        sql[i_using + 5:i_on])
    spec.on_sql = sql[i_on + 2:i_when].strip()
    if not spec.on_sql:
        raise ValueError("empty ON condition")

    rest = sql[i_when:]
    rmask = mask[i_when:]
    # WHEN boundaries: every top-level WHEN
    bounds = []
    pos = 0
    while True:
        j = _find_kw(rest, rmask, "WHEN", pos)
        if j < 0:
            break
        bounds.append(j)
        pos = j + 4
    bounds.append(len(rest))
    for a, b in zip(bounds, bounds[1:]):
        clause = rest[a + 4: b]
        cmask = _top_mask(clause)
        i_then = _find_kw(clause, cmask, "THEN")
        if i_then < 0:
            raise ValueError(f"WHEN clause missing THEN: {clause!r}")
        head, act = clause[:i_then], clause[i_then + 4:].strip()
        hm = _MATCH_HEAD.match(head)
        if not hm:
            raise ValueError(f"cannot parse WHEN head: {head!r}")
        cond = hm.group("cond")
        is_not = bool(hm.group("not"))
        by = (hm.group("by") or "").upper()
        if is_not and by == "SOURCE":
            kind = "by_source"
        elif is_not:
            kind = "not_matched"
        elif by:
            raise ValueError("MATCHED BY is only valid with NOT")
        else:
            kind = "matched"
        am = re.match(r"^(UPDATE\s+SET|DELETE|INSERT)\b(.*)$",
                      act, re.I | re.S)
        if not am:
            raise ValueError(f"cannot parse THEN action: {act!r}")
        verb = am.group(1).upper().split()[0]
        body = am.group(2).strip()
        if kind == "not_matched":
            if verb != "INSERT":
                raise ValueError(
                    "WHEN NOT MATCHED supports INSERT only")
            spec.not_matched.append((cond, _parse_insert(body)))
        else:
            if verb == "INSERT":
                raise ValueError(
                    f"WHEN {'NOT MATCHED BY SOURCE' if kind == 'by_source' else 'MATCHED'}"
                    " cannot INSERT")
            payload = (_parse_assignments(body)
                       if verb == "UPDATE" else None)
            entry = (cond, "update" if verb == "UPDATE" else "delete",
                     payload)
            getattr(spec, kind).append(entry)
    if not (spec.matched or spec.not_matched or spec.by_source):
        raise ValueError("MERGE needs at least one WHEN clause")
    return spec


# --- name → table-root resolution ---------------------------------------------

def resolve_table_root(target: str, catalog: str | None = None) -> str:
    """Resolve a DML target reference to a manifest table root:
    an explicit path (contains a separator, or backtick-quoted), a
    name registered this session via ``register_sql_table``, or a
    persistent-catalog name (``catalog_add``)."""
    from silvia_spark.catalog import catalog_list
    from silvia_spark.operators.manifest_table import (_norm,
                                                       current_version)
    from silvia_spark.sources.manifest_stream import _SQL_TABLES

    ref = _unquote_ident(target)
    if os.sep in ref or ref.startswith("."):
        root = _norm(ref)
        if current_version(root) is None:
            raise FileNotFoundError(
                f"{root} is not a manifest table (no committed "
                "snapshot)")
        return root
    if ref.lower() in _SQL_TABLES:
        return _SQL_TABLES[ref.lower()]
    try:
        entries = catalog_list(catalog)
    except ValueError:
        entries = {}
    if ref in entries:
        return entries[ref]["path"]
    raise ValueError(
        f"cannot resolve DML target {ref!r} to a manifest table: "
        "register it with register_sql_table / catalog_add, or pass "
        "an explicit path")


def _source_df(spark: SparkSession, ref: str,
               alias: str | None) -> DataFrame:
    if ref.startswith("("):
        return spark.sql(f"SELECT * FROM {ref} "
                         f"AS {alias or '__silvia_src'}")
    return spark.table(_unquote_ident(ref))


# --- ON-condition key extraction ------------------------------------------------

def _equi_keys(on_sql: str, tq: str, sq: str, tcols: list[str],
               scols: list[str]) -> list[tuple[str, str]]:
    """ON as a conjunction of target-col = source-col equalities →
    [(target_col, source_col)]. Anything else refuses loudly."""
    mask = _top_mask(on_sql)
    pairs: list[tuple[str, str]] = []
    pos = 0
    parts = []
    while True:
        j = _find_kw(on_sql, mask, "AND", pos)
        if j < 0:
            parts.append(on_sql[pos:])
            break
        parts.append(on_sql[pos:j])
        pos = j + 3

    def classify(ref: str) -> tuple[str, str]:
        ref = ref.strip()
        if "." in ref:
            qual, col = ref.rsplit(".", 1)
            qual, col = _unquote_ident(qual), _unquote_ident(col)
            if qual == tq:
                return "t", col
            if qual == sq:
                return "s", col
            raise ValueError(
                f"ON references unknown qualifier {qual!r} "
                f"(target is {tq!r}, source is {sq!r})")
        col = _unquote_ident(ref)
        in_t, in_s = col in tcols, col in scols
        if in_t and in_s:
            raise ValueError(
                f"ON column {col!r} is ambiguous — qualify it")
        if in_t:
            return "t", col
        if in_s:
            return "s", col
        raise ValueError(f"ON column {col!r} found in neither side")

    for p in parts:
        m = re.match(r"^\s*([\w.`]+)\s*=\s*([\w.`]+)\s*$", p)
        if not m:
            raise NotImplementedError(
                f"MERGE ON must be a conjunction of column equality "
                f"predicates (got {p.strip()!r}): the file-granular "
                "rewrite plan prunes on key ranges — use the Python "
                "commit_merge API for exotic match conditions")
        (sa, ca), (sb, cb) = classify(m.group(1)), classify(m.group(2))
        if {sa, sb} != {"t", "s"}:
            raise ValueError(
                f"ON predicate {p.strip()!r} must compare a target "
                "column to a source column")
        pairs.append((ca, cb) if sa == "t" else (cb, ca))
    return pairs


# --- MERGE execution -------------------------------------------------------------

def merge_into_sql(spark: SparkSession, sql: str,
                   path: str | None = None,
                   catalog: str | None = None) -> int:
    """Execute a ``MERGE INTO`` statement against a manifest table and
    return the committed version. See the module docstring for the
    supported form and the scope refusals; semantics follow the SQL
    standard (first applicable WHEN clause wins per row, a target row
    matched by multiple source rows raises), and the commit is
    ``commit_merge``'s — atomic, stats-pruned, CDF-recorded."""
    from silvia_spark.operators.manifest_table import (_load_doc,
                                                       commit_merge,
                                                       read_snapshot)

    spec = parse_merge(sql)
    root = path or resolve_table_root(spec.target, catalog)
    doc = _load_doc(root)
    part_col = doc.get("part_col")
    if not part_col:
        raise ValueError(
            "table records no partition column (pre-r08 layout): "
            "commit once via commit_append to migrate")
    pt = doc.get("part_transform")
    if pt:
        # under a hidden transform the logical schema carries the
        # SOURCE column; commit_merge expects it as the partition
        # argument and derives the directory value itself
        part_col = pt["source"]

    tq = spec.target_alias or _unquote_ident(spec.target).split(".")[-1]
    sq = spec.source_alias or (
        None if spec.source.startswith("(")
        else _unquote_ident(spec.source).split(".")[-1])
    if sq is None:
        raise ValueError("a subquery source needs an alias")
    if tq == sq:
        raise ValueError(f"target and source share the name {tq!r} — "
                         "alias one of them")

    tgt0 = read_snapshot(spark, root)
    src0 = _source_df(spark, spec.source, sq)
    tcols, scols = list(tgt0.columns), list(src0.columns)
    schema = {f.name: f.dataType for f in tgt0.schema.fields}
    key_pairs = _equi_keys(spec.on_sql, tq, sq, tcols, scols)
    tkeys = [t for t, _ in key_pairs]
    skeys = [s for _, s in key_pairs]
    for t, s in key_pairs:
        if t not in tcols:
            raise ValueError(f"ON target column {t!r} not in table "
                             f"columns {tcols}")
        if s not in scols:
            raise ValueError(f"ON source column {s!r} not in source "
                             f"columns {scols}")
    merge_keys = tkeys + ([part_col] if part_col not in tkeys else [])

    # assignment scope checks (see module docstring)
    for cond, act, payload in spec.matched + spec.by_source:
        if act != "update":
            continue
        assigns = (payload if isinstance(payload, dict)
                   else {c: f"{sq}.{c}" for c in tcols
                         if c in scols and c not in tkeys})
        if payload == "*" and part_col not in tkeys \
                and part_col in scols:
            raise NotImplementedError(
                f"UPDATE SET * would assign the partition column "
                f"{part_col!r} from the source: the keyed merge plan "
                "cannot move rows between partitions — add "
                f"{part_col!r} to ON, or assign columns explicitly")
        for c in assigns:
            if c not in schema:
                raise ValueError(f"SET targets unknown column {c!r}")
            if isinstance(payload, dict) and c in merge_keys:
                raise NotImplementedError(
                    f"UPDATE SET may not assign {c!r}: it is a merge "
                    "key (ON key or partition column) — the committed "
                    "anti-join removes replaced rows by key, so a "
                    "key-moving update would resurrect the old row")

    tgt = tgt0.alias(tq)
    src = src0.alias(sq)

    def _out_cols(mc_col, upd_assigns, default_side=tq):
        """Post-merge value per table column: chained per-update-clause
        CASE over the clause index, defaulting to the kept row."""
        outs = []
        for c in tcols:
            e = F.col(f"{default_side}.{c}")
            for i, assigns in upd_assigns:
                if c in assigns:
                    e = F.when(mc_col == i,
                               F.expr(assigns[c])).otherwise(e)
            outs.append(e.cast(schema[c]).alias(c))
        return outs

    def _clause_index(clauses):
        e = None
        for i, (cond, _act, _p) in enumerate(clauses, 1):
            c = F.expr(cond) if cond else F.lit(True)
            e = F.when(c, F.lit(i)) if e is None else e.when(c, F.lit(i))
        return e if e is not None else F.lit(None).cast("int")

    def _normalize_assigns(act, payload):
        if act != "update":
            return None
        if payload == "*":
            return {c: f"{sq}.{c}" for c in tcols
                    if c in scols and c not in tkeys}
        return payload

    from pyspark.sql import Window

    changes_parts: list[DataFrame] = []

    def _group_outputs(rows, clauses, side_qual, tag):
        """Shared matched / by-source engine: evaluate the clause
        chain per row, find CHANGED key groups with one window pass,
        re-emit every surviving row of a changed group as 'U' and a
        'D' marker per deleted row. Rows of untouched groups never
        enter the change batch — their files carry by reference."""
        mc = _clause_index(clauses)
        w = Window.partitionBy(
            *[F.col(f"{side_qual}.{k}") for k in merge_keys])
        rows = rows.withColumn("__mc", mc).withColumn(
            "__touched",
            F.max(F.when(F.col("__mc").isNotNull(), 1)
                  .otherwise(0)).over(w))
        rows = rows.where(F.col("__touched") == 1)
        del_idx = [i for i, (_c, a, _p) in enumerate(clauses, 1)
                   if a == "delete"]
        upd_assigns = [(i, _normalize_assigns(a, p))
                       for i, (_c, a, p) in enumerate(clauses, 1)
                       if a == "update"]
        is_del = (F.col("__mc").isin(del_idx) if del_idx
                  else F.lit(False))
        keep = rows.where(F.col("__mc").isNull() | ~is_del)
        u = keep.select(*_out_cols(F.col("__mc"), upd_assigns,
                                   default_side=side_qual),
                        F.lit("U").alias("op"))
        changes_parts.append(u)
        if del_idx:
            d = (rows.where(is_del)
                 .select(*[(F.col(f"{side_qual}.{c}")
                            .cast(schema[c]) if c in merge_keys
                            else F.lit(None).cast(schema[c])).alias(c)
                           for c in tcols],
                         F.lit("D").alias("op")))
            changes_parts.append(d)

    on_expr = F.expr(spec.on_sql)
    if spec.matched:
        # SQL-standard nondeterminism guard: a duplicate source key
        # tuple multi-matches every target row carrying it. Two-stage
        # so the common case (unique source keys) costs one agg over
        # the SOURCE only — the target is scanned for the precise
        # check only when a duplicate actually exists (Delta's rule:
        # duplicates that match no target row are legal).
        src_dups = (src0.groupBy(*skeys).count()
                    .where(F.col("count") > 1).limit(1).count())
        if src_dups:
            hit = (src0.groupBy(*skeys)
                   .agg(F.count(F.lit(1)).alias("__n"))
                   .where(F.col("__n") > 1)
                   .join(tgt0.select(
                       *[F.col(k).alias(sk) for k, sk
                         in zip(tkeys, skeys)]).distinct(),
                       skeys, "left_semi").limit(1).count())
            if hit:
                raise ValueError(
                    "MERGE: a target row matches more than one "
                    "source row — the SQL standard makes this merge "
                    "nondeterministic; deduplicate the source on the "
                    "ON keys first")
        pairs = tgt.join(src, on_expr, "inner")
        _group_outputs(pairs, spec.matched, tq, "matched")

    if spec.by_source:
        skv = (src0.select(*[F.col(s).alias(f"__sk{i}")
                             for i, s in enumerate(skeys)])
               .distinct())
        cond = None
        for i, t in enumerate(tkeys):
            c = F.col(f"{tq}.{t}") == F.col(f"__sk{i}")
            cond = c if cond is None else cond & c
        nms = tgt.join(skv, cond, "left_anti")
        _group_outputs(nms, spec.by_source, tq, "by_source")

    if spec.not_matched:
        tkv = (tgt0.select(*[F.col(t).alias(f"__tk{i}")
                             for i, t in enumerate(tkeys)])
               .distinct())
        cond = None
        for i, s in enumerate(skeys):
            c = F.col(f"{sq}.{s}") == F.col(f"__tk{i}")
            cond = c if cond is None else cond & c
        nm = src.join(tkv, cond, "left_anti")
        ins_clauses = [(cond_, "insert", p)
                       for cond_, p in spec.not_matched]
        mc = _clause_index(ins_clauses)
        nm = nm.withColumn("__mc", mc).where(F.col("__mc").isNotNull())
        outs = []
        for c in tcols:
            e = F.lit(None).cast(schema[c])
            for i, (_cond, payload) in enumerate(spec.not_matched, 1):
                if payload == "*":
                    if c not in scols:
                        raise ValueError(
                            f"INSERT * needs source column {c!r} "
                            "(source has {})".format(scols))
                    v = F.col(f"{sq}.{c}")
                else:
                    cols_, vals_ = payload
                    if c in cols_:
                        v = F.expr(vals_[cols_.index(c)])
                    else:
                        continue
                e = F.when(F.col("__mc") == i, v).otherwise(e)
            outs.append(e.cast(schema[c]).alias(c))
        changes_parts.append(nm.select(*outs, F.lit("I").alias("op")))

    changes = changes_parts[0]
    for p in changes_parts[1:]:
        changes = changes.unionByName(p)

    if part_col not in tkeys:
        # the anti-join removes replaced rows by merge_keys (which
        # include part_col): a NULL partition value never equi-matches,
        # so a changed group holding one would leave its old rows
        # behind — refuse rather than duplicate
        bad = changes.where(F.col(part_col).isNull()
                            & (F.col("op") != "I")).limit(1).count()
        if bad:
            raise NotImplementedError(
                f"MERGE touching rows with NULL {part_col!r} needs "
                "the partition column in ON (NULL keys never match "
                "the remove-side anti-join)")

    return commit_merge(spark, root, changes, merge_keys, part_col)


# --- UPDATE / DELETE ------------------------------------------------------------

_UPDATE_RE = re.compile(r"^\s*UPDATE\s+", re.I)
_DELETE_RE = re.compile(r"^\s*DELETE\s+FROM\s+", re.I)


def _target_and_where(sql: str, head_end: int, mask: list[bool],
                      upto_kw: str | None):
    """Split '<target> [SET ...] [WHERE cond]' for UPDATE/DELETE."""
    i_where = _find_kw(sql, mask, "WHERE", head_end)
    body_end = i_where if i_where >= 0 else len(sql)
    where_sql = (sql[i_where + 5:].strip() if i_where >= 0 else None)
    if where_sql == "":
        raise ValueError("empty WHERE clause")
    if upto_kw:
        i_kw = _find_kw(sql, mask, upto_kw, head_end)
        if i_kw < 0 or i_kw > body_end:
            raise ValueError(f"statement missing {upto_kw}")
        target_text = sql[head_end:i_kw]
        body = sql[i_kw + len(upto_kw):body_end]
    else:
        target_text = sql[head_end:body_end]
        body = None
    ref, alias = _ref_and_alias(target_text)
    if alias is not None:
        raise NotImplementedError(
            "UPDATE/DELETE aliases are not supported — the single "
            "table's columns are unambiguous, reference them bare")
    return ref, body, where_sql


def update_sql(spark: SparkSession, sql: str,
               path: str | None = None,
               catalog: str | None = None) -> int:
    """Execute ``UPDATE <table> SET col = expr, ... [WHERE cond]``
    against a manifest table and return the committed version (the
    unchanged current version when nothing matches — a no-match
    update is a no-op, not a burned version number). Routed through
    ``commit_update``'s stats-pruned copy-on-write; assigning the
    partition column refuses (see commit_update)."""
    sql = sql.strip().rstrip(";")
    if not _UPDATE_RE.match(sql):
        raise ValueError("not an UPDATE statement")
    mask = _top_mask(sql)
    head_end = _UPDATE_RE.match(sql).end()
    ref, set_body, where_sql = _target_and_where(
        sql, head_end, mask, "SET")
    assigns = _parse_assignments(set_body)
    if assigns == "*":
        raise ValueError("UPDATE SET * is only meaningful in MERGE")
    from silvia_spark.operators.manifest_table import commit_update

    root = path or resolve_table_root(ref, catalog)
    return commit_update(spark, root, assigns, where=where_sql)


def delete_sql(spark: SparkSession, sql: str,
               path: str | None = None,
               catalog: str | None = None) -> int:
    """Execute ``DELETE FROM <table> [WHERE cond]`` against a manifest
    table and return the committed version (unchanged when nothing
    matches). Routed through ``commit_delete``'s predicate mode:
    merge-on-read deletion vectors for sparse hits, copy-on-write past
    the density crossover — a SQL DELETE gets the exact 100 TB
    behavior the Python API has. ``DELETE FROM t`` with no WHERE
    deletes every row (the SQL meaning), one commit."""
    sql = sql.strip().rstrip(";")
    if not _DELETE_RE.match(sql):
        raise ValueError("not a DELETE FROM statement")
    mask = _top_mask(sql)
    head_end = _DELETE_RE.match(sql).end()
    ref, _body, where_sql = _target_and_where(
        sql, head_end, mask, None)
    from silvia_spark.operators.manifest_table import commit_delete

    root = path or resolve_table_root(ref, catalog)
    return commit_delete(spark, root, where=where_sql or "true")


# --- maintenance / DDL verbs ------------------------------------------------
#
# The rest of a lakehouse user's SQL vocabulary, each one line of text
# over machinery the Python API already proves: CREATE TABLE AS,
# OPTIMIZE [ZORDER BY], VACUUM [RETAIN n HOURS], DESCRIBE HISTORY.

def _doc_part_source(doc: dict) -> str:
    pt = doc.get("part_transform")
    return pt["source"] if pt else doc.get("part_col")


def create_table_sql(spark: SparkSession, sql: str,
                     path: str | None = None,
                     catalog: str | None = None) -> str:
    """``CREATE TABLE <name> [PARTITIONED BY (col)] [LOCATION '<dir>']
    AS <select>`` → ``create_table`` + session registration (and a
    durable ``catalog_add`` when ``catalog`` names a catalog file).
    The table root comes from LOCATION or the ``path`` argument —
    a name alone has nowhere to put data. Returns the root."""
    from silvia_spark.catalog import catalog_add
    from silvia_spark.operators.manifest_table import create_table
    from silvia_spark.sources.manifest_stream import register_sql_table

    text = sql.strip().rstrip(";")
    m = re.match(
        r"^\s*CREATE\s+TABLE\s+(?P<t>`[^`]+`|\S+)"
        r"(?:\s+PARTITIONED\s+BY\s*\(\s*(?P<p>[^)]+?)\s*\))?"
        r"(?:\s+LOCATION\s+'(?P<loc>[^']+)')?"
        r"\s+AS\s+(?P<q>.+)$", text, re.I | re.S)
    if not m:
        raise ValueError(
            "expected CREATE TABLE <name> [PARTITIONED BY (col)] "
            "[LOCATION '<dir>'] AS <select>")
    name = _unquote_ident(m.group("t"))
    root = m.group("loc") or path
    if not root:
        raise ValueError(
            "CREATE TABLE needs a LOCATION '<dir>' clause (or the "
            "path= argument) — a name alone has nowhere to put data")
    part = m.group("p")
    df = spark.sql(m.group("q"))
    if part:
        part_cols = [_unquote_ident(c) for c in part.split(",")]
        if len(part_cols) != 1:
            raise NotImplementedError(
                "manifest tables partition by ONE column "
                f"(got {part_cols})")
        part_col = part_cols[0]
    else:
        # unpartitioned CREATE: a constant partition keeps the Hive
        # layout machinery intact with exactly one directory
        part_col = "__all"
        df = df.withColumn("__all", F.lit("all"))
    create_table(df, root, part_col)
    if name and not (os.sep in name or name.startswith(".")):
        register_sql_table(spark, name, root)
        if catalog is not None:
            catalog_add(name, root, catalog=catalog)
    return root


def optimize_sql(spark: SparkSession, sql: str,
                 path: str | None = None,
                 catalog: str | None = None,
                 target_files: int = 1) -> int:
    """``OPTIMIZE <table> [ZORDER BY (c1, c2, ...)]`` →
    ``commit_compaction`` (content-preserving small-file rewrite; the
    ZORDER form rewrites every partition ordered so the per-file
    min/max stats index tightens — Delta's OPTIMIZE semantics).
    Returns the committed version."""
    from silvia_spark.operators.manifest_table import (_load_doc,
                                                       commit_compaction)

    text = sql.strip().rstrip(";")
    m = re.match(
        r"^\s*OPTIMIZE\s+(?P<t>`[^`]+`|\S+)"
        r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<z>[^)]+?)\s*\))?\s*$",
        text, re.I)
    if not m:
        raise ValueError(
            "expected OPTIMIZE <table> [ZORDER BY (cols)]")
    root = path or resolve_table_root(m.group("t"), catalog)
    doc = _load_doc(root)
    cols = ([_unquote_ident(c) for c in m.group("z").split(",")]
            if m.group("z") else None)
    return commit_compaction(
        spark, root, _doc_part_source(doc),
        target_files=target_files, order_by=cols,
        zorder=bool(cols and len(cols) > 1))


def vacuum_sql(spark: SparkSession, sql: str,
               path: str | None = None,
               catalog: str | None = None) -> list[str]:
    """``VACUUM <table> [RETAIN <n> VERSIONS]`` → ``vacuum``. The
    retention unit is VERSIONS (manifest snapshots), the native
    retention axis of this table layer — Delta's RETAIN ... HOURS
    maps onto it via table_history timestamps; refused here rather
    than approximated. Returns the removed file list."""
    from silvia_spark.operators.manifest_table import vacuum

    text = sql.strip().rstrip(";")
    m = re.match(
        r"^\s*VACUUM\s+(?P<t>`[^`]+`|\S+)"
        r"(?:\s+RETAIN\s+(?P<n>\d+)\s+(?P<unit>VERSIONS|HOURS))?\s*$",
        text, re.I)
    if not m:
        raise ValueError("expected VACUUM <table> [RETAIN n VERSIONS]")
    if m.group("unit") and m.group("unit").upper() == "HOURS":
        raise NotImplementedError(
            "VACUUM RETAIN ... HOURS: this layer retains by VERSIONS "
            "(snapshots); use RETAIN <n> VERSIONS, or the Python "
            "vacuum() after resolving a version via table_history")
    root = path or resolve_table_root(m.group("t"), catalog)
    keep = int(m.group("n")) if m.group("n") else 1
    return vacuum(root, keep_versions=keep)


def describe_history_sql(spark: SparkSession, sql: str,
                         path: str | None = None,
                         catalog: str | None = None) -> DataFrame:
    """``DESCRIBE HISTORY <table>`` → the commit history as a
    DataFrame (version, op, parent, commit timestamp) — newest
    first, like Delta's."""
    from silvia_spark.operators.manifest_table import table_history

    text = sql.strip().rstrip(";")
    m = re.match(r"^\s*DESCRIBE\s+HISTORY\s+(?P<t>`[^`]+`|\S+)\s*$",
                 text, re.I)
    if not m:
        raise ValueError("expected DESCRIBE HISTORY <table>")
    root = path or resolve_table_root(m.group("t"), catalog)
    hist = table_history(root)
    return spark.createDataFrame(
        [(int(h["version"]), str(h.get("op") or ""),
          (None if h.get("parent") is None else int(h["parent"])),
          float(h.get("ts") or 0.0)) for h in hist],
        "version long, op string, parent long, ts double")
