"""Static divide-guard audit over every registered oracle (VERDICT r12 #2).

The defect class this hunts (5 real instances across r11-r12, found one
at a time by ADVICE): a division whose denominator can be zero on thin
data.  Spark under ANSI mode raises DIVIDE_BY_ZERO where DuckDB yields
NULL, so an unguarded site is a latent gate divergence the sf0.01 sweep
never exercises (its fixtures rarely produce empty groups).  The dynamic
sf0.001 sweep only covers denominators the fixture actually zeroes; this
audit is the structural complement: it extracts every division site from
every oracle and classifies the denominator.

A site is SAFE when one of these static rules holds:

  literal        nonzero numeric literal denominator
  nullif         denominator wrapped in NULLIF(...) (NULL/0 on both engines)
  count-star     COUNT(*) / COUNT(1) without a window frame — a GROUP BY
                 group or an unframed window partition always has >= 1 row
  zero-compared  the SQL somewhere compares the denominator expression (or
                 its innermost function argument) against zero/one — the
                 author handled the degenerate case (CASE WHEN d = 0 THEN
                 NULL, WHEN d > 0 THEN ..., WHERE d <> 0, HAVING d >= 1, ...)
  greatest       GREATEST(..., k) with a positive literal floor

(plus product/alias/difference rules — see the classifier).  Everything
else is UNGUARDED and must either be fixed (guard BOTH the Spark
expression and the oracle, per the r11 convention) or adjudicated below
— ADJUDICATION_RULES for structural classes, ADJUDICATED_SAFE keyed
(query, no-space denominator) for single sites — with a written reason.

tests/test_divide_guards.py turns this into a standing gate: a new
oracle with an unguarded, unadjudicated division site fails the suite.

Run directly for a human-readable report:  python3 tools/divide_guard_audit.py
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_STRING = re.compile(r"'(?:[^']|'')*'")
_COMMENT = re.compile(r"--[^\n]*")
_NUMBER = re.compile(r"[0-9]+(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?")
_IDENT = re.compile(r"[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*")
_SUFFIX = re.compile(r"(FILTER|OVER)\s*\(", re.I)


def _blank(sql: str) -> str:
    """Blank out string literals and -- comments, preserving offsets."""

    def pad(m: re.Match) -> str:
        return " " * len(m.group(0))

    return _COMMENT.sub(pad, _STRING.sub(pad, sql))


def _balanced(s: str, i: int) -> int:
    """Given s[i] == '(', return the index just past the matching ')'."""
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return len(s)


def _parse_denominator(s: str, i: int) -> tuple[str, int]:
    """Parse one primary expression starting at s[i] (the denominator of
    a division: ``a / b * c`` has denominator ``b``; parenthesised and
    function-call denominators are taken whole, including FILTER/OVER
    suffixes so ``count(x) over (...)`` classifies as one unit)."""
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    start = i
    if i < n and s[i] in "+-":
        i += 1
        while i < n and s[i].isspace():
            i += 1
    if i < n and s[i] == "(":
        i = _balanced(s, i)
        return s[start:i], i
    m = _NUMBER.match(s, i)
    if m:
        return s[start : m.end()], m.end()
    m = _IDENT.match(s, i)
    if not m:
        return s[start : i + 1], i + 1
    i = m.end()
    j = i
    while j < n and s[j].isspace():
        j += 1
    if j < n and s[j] == "(":
        i = _balanced(s, j)
        while True:  # count(x) FILTER (...) OVER (...)
            j = i
            while j < n and s[j].isspace():
                j += 1
            m2 = _SUFFIX.match(s, j)
            if not m2:
                break
            i = _balanced(s, m2.end() - 1)
    return s[start:i], i


@dataclass
class Site:
    query: str
    op: str  # '/', '//' or '%'
    denom: str  # denominator source text
    occurrence: int  # nth division with this denominator in this query
    context: str  # +-60 chars around the site
    verdict: str  # 'safe:<rule>' or 'UNGUARDED'


def _nospace(text: str) -> str:
    return re.sub(r"\s+", "", text.lower())


# comparison fragments that mean "the author handled zero" when found
# adjacent to the denominator text (no-space normalised, substring match;
# prefix matching makes 'd>0' also hit 'd>0.0' and 'd=0' hit 'd=0.0').
# Two families with different evidence requirements (ADVICE r13):
#   POSITIVE forms assert d != 0 (WHERE d <> 0, WHEN d > 0 THEN x/d)
#   — substring adjacency is accepted.  KNOWN LIMITATION: this is
#   flow-insensitive, so a positive comparison with the division in
#   the ELSE branch (WHEN d > 0 THEN 0 ELSE x/d END) would pass
#   silently — adjudicators must not treat 'safe:zero-compared' as
#   proof for that inverted shape.
#   DEGENERATE forms are TRUE when d = 0 (WHEN d = 0 / d <= 0 THEN
#   ...) — these additionally require the THEN branch to be a
#   degenerate RESULT (NULL or a bare literal), because `CASE WHEN
#   d <= 0 THEN x/d ELSE 0 END` puts the division INSIDE the zero
#   branch and must NOT classify safe.
_GUARD_AFTER_POSITIVE = ("<>0", "!=0", ">0", ">=1")
_GUARD_AFTER_DEGENERATE = ("=0", "<=0", "<1", "in(0")
_GUARD_BEFORE_POSITIVE = ("0<>", "0!=", "0<", "1<=")
_GUARD_BEFORE_DEGENERATE = ("0=", "0>=", "1>")
# THEN whose result is NULL or a bare numeric literal (the division
# cannot live inside it); anchored at the matched comparison's OWN
# branch by _then_degenerate_at — see below
_THEN_DEGENERATE = re.compile(
    r"then(?:null|-?[0-9]+(?:\.[0-9]+)?(?:else|end|when|,|\)))"
)


def _then_degenerate_at(sql2: str, pos: int) -> bool:
    """True when the matched degenerate comparison's OWN branch emits a
    degenerate result: starting at `pos` (the comparison's end in the
    no-space text), skip only OR'd sibling conditions — each of which
    keeps the WHEN true whenever the matched comparison is true, since
    AND binds tighter than OR — and require THEN NULL / THEN <literal>
    right there.  ADVICE r14: the previous fixed-window re.search let a
    LATER branch's THEN NULL vouch for a comparison whose own branch
    contains the division (`WHEN d = 0 THEN x/d WHEN e = 0 THEN NULL`),
    and conversely truncated long-but-sound OR chains.  An AND'd
    condition immediately after the comparison conservatively fails
    (the branch then fires only conjointly, so d = 0 does not imply
    the degenerate result)."""
    n = len(sql2)
    i = pos
    # the comparison fragments match by PREFIX ('d=0' also hits
    # 'd=0.0', 'd<1' hits 'd<10'): consume the literal's numeric tail
    # before looking for the branch (any k >= 0 still routes zero away
    # for the degenerate forms)
    while i < n and sql2[i] in "0123456789.":
        i += 1
    while i < n:
        if sql2.startswith("then", i):
            return _THEN_DEGENERATE.match(sql2, i) is not None
        if not sql2.startswith("or", i):
            return False
        i += 2  # skip one OR'd sibling: scan to the next top-level
        depth = 0  # 'or'/'then' (paren-aware)
        while i < n:
            ch = sql2[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    return False  # left the enclosing expression
                depth -= 1
            elif depth == 0 and (
                sql2.startswith("then", i) or sql2.startswith("or", i)
            ):
                break
            i += 1
    return False


def _zero_compared(sql2: str, expr: str) -> bool:
    """True when the SQL compares `expr` against zero/one in a form
    that routes the zero case away from a division (see the guard
    family comment above)."""
    for g in _GUARD_AFTER_POSITIVE:
        if (expr + g) in sql2:
            return True
    for g in _GUARD_BEFORE_POSITIVE:
        if (g + expr) in sql2:
            return True
    esc = re.escape(expr)
    for g in _GUARD_AFTER_DEGENERATE:
        for m in re.finditer(esc + re.escape(g), sql2):
            if _then_degenerate_at(sql2, m.end()):
                return True
    for g in _GUARD_BEFORE_DEGENERATE:
        for m in re.finditer(re.escape(g) + esc, sql2):
            if _then_degenerate_at(sql2, m.end()):
                return True
    return False

_COUNT_STAR = re.compile(r"count\((\*|1)\)(over\(.*\))?$")
# matched against no-space text, so no \b: a frame clause always
# reads "<unit>between..." or "<unit>unbounded..." there
_FRAME = re.compile(r"(rows|range|groups)(between|unbounded|[0-9])", re.I)
_GREATEST_FLOOR = re.compile(r"greatest\(.*,(\d+(?:\.\d+)?)\)$")
_FUNC_WRAP = re.compile(r"[a-z_][a-z0-9_.]*\((.*)\)$")


def _denominator_candidates(d2: str) -> set[str]:
    """The denominator plus progressively unwrapped forms to match guard
    comparisons against (strip outer parens, one function layer, CAST)."""
    out: set[str] = set()
    frontier = [d2]
    while frontier:
        c = frontier.pop()
        if not c or c in out:
            continue
        out.add(c)
        if c.startswith("(") and c.endswith(")"):
            frontier.append(c[1:-1])
        m = _FUNC_WRAP.fullmatch(c)
        if m:
            inner = m.group(1)
            if c.startswith("cast(") and "as" in inner:
                inner = inner[: inner.rindex("as")]
            frontier.append(inner)
        # table-qualified column: also try the bare column name (guards
        # are often written on the unqualified alias)
        m = re.fullmatch(r"[a-z_][a-z0-9_]*\.([a-z_][a-z0-9_]*)", c)
        if m:
            frontier.append(m.group(1))
    return out


def _strip_outer_parens(d2: str) -> str:
    while d2.startswith("(") and d2.endswith(")") and _balanced(d2, 0) == len(d2):
        d2 = d2[1:-1]
    return d2


def _split_product(d2: str) -> list[str]:
    """Split a no-space expression on top-level '*' (a positive product
    needs every factor positive).  Returns [d2] when there is no
    top-level '*' or a top-level '+'/'-' makes the split unsound."""
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(d2):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "+-" and i > 0 and d2[i - 1] not in "e(*+-":
            return [d2]  # top-level sum: not a pure product
        elif depth == 0 and ch == "*":
            parts.append(d2[start:i])
            start = i + 1
    parts.append(d2[start:])
    return parts if len(parts) > 1 else [d2]


def _bound_implies_positive(sql2: str, base: str, floor: float) -> bool:
    """True when the SQL constrains `base` to a value > floor:
    ``base >= k`` with k > floor, or ``base > k`` with k >= floor."""
    esc = re.escape(base)
    for m in re.finditer(esc + r">=([0-9]+(?:\.[0-9]+)?)", sql2):
        if float(m.group(1)) > floor:
            return True
    for m in re.finditer(esc + r">([0-9]+(?:\.[0-9]+)?)", sql2):
        if float(m.group(1)) >= floor:
            return True
    return False


_SUB_CONST = re.compile(r"(.+?)-([0-9]+(?:\.[0-9]+)?)$")


def _guarded_below(sql2: str, base: str, floor: float) -> bool:
    """True when a ``base <= k THEN NULL`` guard (k >= floor) precedes
    use — the division only evaluates with base > k >= floor."""
    for m in re.finditer(re.escape(base) + r"<=([0-9]+(?:\.[0-9]+)?)", sql2):
        if float(m.group(1)) >= floor and _then_degenerate_at(sql2, m.end()):
            return True
    return False


def _split_diff(d2: str) -> tuple[str, str] | None:
    """Split a no-space expression at a single top-level '-' into its
    two operands; None when the shape is not a plain difference.
    Top-level '*' and '/' are allowed INSIDE the operands (X*Y - Z is
    the difference of X*Y and Z, and a guard ``X*Y = Z THEN NULL``
    soundly covers it — the r15 double-stated variance denominators);
    only a top-level '+' or a second '-' makes the split ambiguous."""
    depth = 0
    cut = -1
    for i, ch in enumerate(d2):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and i > 0 and ch == "+":
            return None
        elif depth == 0 and ch == "-" and i > 0:
            if cut >= 0:
                return None
            cut = i
    if cut <= 0 or cut == len(d2) - 1:
        return None
    return d2[:cut], d2[cut + 1 :]
# matched against the no-space text; the alias is terminated by a
# non-identifier construct (a keyword fused by whitespace removal
# can't extend it because SQL requires a separator after an alias,
# so we check the alias is not followed by [a-z0-9_]-extending text
# via an explicit boundary set instead of \b)
_COUNT_ALIAS = r"(?:cast\()?count\((?:\*|1)\)(?:as(?:bigint|double|int)\))?as{d}(?:from|where|,|\)|group|order|$)"
_ROWNUM_ALIAS = r"(?:row_number|rank|dense_rank)\(\)over\(.{{0,240}}?\)as{d}(?:from|where|,|\)|group|order|$)"


def _classify_expr(d2: str, sql2: str, depth: int = 0) -> str | None:
    """Verdict for one no-space denominator expression, or None."""
    if depth > 4 or not d2:
        return None
    if d2.startswith(("+",)):
        d2 = d2[1:]
    orig = d2  # guards are often written on the parenthesized form:
    # "(SELECT count(*) FROM exact) = 0" guards "(selectcount(*)fromexact)"
    d2 = _strip_outer_parens(d2)
    if not d2:
        return None
    if orig != d2:
        if _zero_compared(sql2, orig):
            return "safe:zero-compared"
        if ("nullif(" + orig) in sql2:
            return "safe:nullif"
    try:
        return "safe:literal" if float(d2) != 0.0 else None
    except ValueError:
        pass
    if d2.startswith("nullif("):
        return "safe:nullif"
    m = _COUNT_STAR.fullmatch(d2)
    if m:
        # count(*) of a group-by group or an unframed window partition
        # is >= 1; a ROWS/RANGE-framed window count CAN be 0 -> unsafe
        if not (m.group(2) and _FRAME.search(m.group(2))):
            return "safe:count-star"
    m = _GREATEST_FLOOR.fullmatch(d2)
    if m and float(m.group(1)) > 0:
        return "safe:greatest"
    if d2.startswith("len(regexp_split_to_array(") or d2.startswith(
        "len(string_split_regex("
    ):
        # splitting ANY string (even '') yields >= 1 element in both
        # DuckDB and Spark's split(); the length is never 0
        return "safe:split-len"
    if re.fullmatch(r"[a-z_][a-z0-9_]*", d2):
        # a bare identifier the query defines as a GROUP BY count
        # (count(*) AS d is >= 1 per emitted group; a cast wrapper keeps
        # that) or as a row_number()/rank() (>= 1 by definition).
        # Scalar-subquery counts ((SELECT count(*) ...) AS d) do NOT set
        # this off: there the alias follows ')', not 'count(*)'.
        if re.search(_COUNT_ALIAS.format(d=re.escape(d2)), sql2):
            return "safe:groupby-count-alias"
        if re.search(_ROWNUM_ALIAS.format(d=re.escape(d2)), sql2):
            return "safe:rownum-alias"
    if ("nullif(" + d2) in sql2 or ("greatest(" + d2) in sql2:
        return "safe:zero-compared"
    if _zero_compared(sql2, d2):
        return "safe:zero-compared"
    # `X >= k` / `X > k` bounds with an arbitrary positive literal
    if _bound_implies_positive(sql2, d2, 0.0):
        return "safe:zero-compared"
    # `CASE WHEN X <= k THEN NULL` (k >= 0): the division only
    # evaluates when X > k >= 0
    if _guarded_below(sql2, d2, 0.0):
        return "safe:zero-compared"
    # `X - c` is positive when the SQL bounds X above c (a WHERE
    # X >= c+1 filter, or a CASE WHEN X <= c THEN NULL guard)
    m = _SUB_CONST.fullmatch(d2)
    if m and (
        _bound_implies_positive(sql2, m.group(1), float(m.group(2)))
        or _guarded_below(sql2, m.group(1), float(m.group(2)))
    ):
        return "safe:bounded-difference"
    # `A - B` guarded by an explicit equality catch
    # (CASE WHEN A = B THEN NULL — the difference is never 0 below)
    diff = _split_diff(d2)
    if diff:
        a, b = diff
        for x, y in ((a, b), (b, a)):
            for g in re.finditer(re.escape(x) + "=" + re.escape(y), sql2):
                if _then_degenerate_at(sql2, g.end()):
                    return "safe:difference-guarded"
    # a product is positive (never zero) when every factor is
    factors = _split_product(d2)
    if len(factors) > 1:
        verdicts = [_classify_expr(f, sql2, depth + 1) for f in factors]
        if all(v is not None for v in verdicts):
            return "safe:product"
    # unwrap a CAST and retry (product factors don't go through the
    # top-level candidate expansion)
    m = re.fullmatch(r"cast\((.+?)as[a-z0-9(),]+\)", d2)
    if m:
        return _classify_expr(m.group(1), sql2, depth + 1)
    # strip a table qualifier and retry (alias rules key on the bare
    # column name)
    m = re.fullmatch(r"[a-z_][a-z0-9_]*\.([a-z_][a-z0-9_]*)", d2)
    if m:
        return _classify_expr(m.group(1), sql2, depth + 1)
    return None


def classify(sql_blanked: str, denom: str) -> str:
    sql2 = _nospace(sql_blanked)
    for d2 in sorted(_denominator_candidates(_nospace(denom)), key=len):
        v = _classify_expr(d2, sql2)
        if v is not None:
            return v
    return "UNGUARDED"


def audit_sql(query: str, sql: str) -> list[Site]:
    s = _blank(sql)
    sites: list[Site] = []
    seen: dict[str, int] = {}
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c not in "/%":
            i += 1
            continue
        # '%' (modulo) raises on zero under Spark ANSI exactly like '/'
        op = "%" if c == "%" else ("//" if s[i : i + 2] == "//" else "/")
        denom, j = _parse_denominator(s, i + len(op))
        denom_stripped = denom.strip()
        key = _nospace(denom_stripped)
        occ = seen.get(key, 0)
        seen[key] = occ + 1
        ctx = re.sub(r"\s+", " ", s[max(0, i - 60) : min(n, j + 40)]).strip()
        sites.append(
            Site(
                query=query,
                op=op,
                denom=denom_stripped,
                occurrence=occ,
                context=ctx,
                verdict=classify(s, denom_stripped),
            )
        )
        i = j if j > i else i + 1
    return sites


def audit_registry() -> list[Site]:
    from map2db_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    sites: list[Site] = []
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        sites.extend(audit_sql(name, spec.oracle))
    return sites


# ---------------------------------------------------------------------------
# Spark-side guard parity (VERDICT r13 #7).  The oracle audit above
# proves the ORACLE handles its zero denominators; this scan checks the
# other engine: for every query whose oracle carries an AUTHOR-written
# guard (CASE/NULLIF/GREATEST — not the statically-safe shapes), the
# Spark callable's source must show a matching guard construct.  A
# one-sided guard is exactly the error-vs-NULL red row the class
# produces (Spark ANSI raises on x/0 where DuckDB yields NULL).
#
# The scan is textual: it catches the drift scenario — an edit
# removes the Spark guard while the oracle keeps its own.  Evidence
# is ANCHORED per site (ADVICE r14): when the oracle site's
# denominator names identifiers that appear in the Spark source, a
# guard fragment must occur NEAR one of those identifier occurrences
# (so an unrelated ">0" elsewhere in the callable no longer vouches
# for a removed guard); only sites whose denominator identifiers are
# absent from the Spark source (renamed columns, restructured
# expressions) fall back to the anywhere-in-source fragment scan.
# Still per-site textual, not data flow.  Guards written in plain
# Python (driver-side iteration) don't surface as any fragment —
# those get SPARK_GUARD_ADJUDICATED entries with a written reason,
# enforced non-stale by the test.
# ---------------------------------------------------------------------------

# oracle verdicts that mean "the author wrote a guard" (vs shapes that
# are safe by construction and need nothing on the Spark side)
_AUTHOR_GUARD_VERDICTS = frozenset({
    "safe:zero-compared", "safe:nullif", "safe:greatest",
    "safe:difference-guarded",
})

# guard evidence in no-space-lowered Spark source: SQL-in-string forms
# (nullif/greatest/CASE comparisons survive verbatim) and DataFrame-API
# forms (F.when(col == 0/1, ...), try_divide)
_SPARK_GUARD_FRAGMENTS = (
    "nullif(", "try_divide", "greatest(",
    "==0", "!=0", ">=1", "<=0", "<=1", "<1", ">0", "<>0",
    "==1", "=0then", "=1then", "in(0",
    # SQL-in-string difference guards compare column to column, no
    # literal (CASE WHEN n0 = tx THEN NULL): the NULL routing itself
    # is the evidence
    "thennull",
)

# identifiers in a denominator that carry no anchoring information
# (SQL keywords, casts, ubiquitous function names)
_ANCHOR_NOISE = frozenset({
    "cast", "as", "double", "bigint", "hugeint", "int", "integer",
    "varchar", "sqrt", "abs", "sum", "count", "min", "max", "avg",
    "least", "greatest", "nullif", "coalesce", "round", "floor",
    "ceil", "exp", "ln", "log", "log10", "power", "select", "from",
    "where", "and", "or", "not", "case", "when", "then", "else",
    "end", "null", "over", "partition", "by", "order", "filter",
    "distinct", "list_dot_product", "len", "epoch_us",
})

_IDENT_RE = re.compile(r"[a-z_][a-z0-9_]*")


def _anchor_tokens(denom2: str) -> set[str]:
    """Identifier tokens of a no-space denominator usable as anchors."""
    return {
        t for t in _IDENT_RE.findall(denom2) if t not in _ANCHOR_NOISE
    }


def _site_evidenced(src2: str, denom2: str) -> bool:
    """Anchored per-site evidence (ADVICE r14): a guard fragment near
    an occurrence of one of the denominator's identifiers in the Spark
    source.  When none of the identifiers appears at all (the Spark
    side renamed or restructured the expression), fall back to the
    anywhere-in-source scan."""
    anchorable = False
    for t in sorted(_anchor_tokens(denom2)):
        # trailing boundary only: no-space text fuses keywords onto
        # identifiers from the left ("casewhenn0=..."), so a leading
        # lookbehind would miss exactly the guard occurrences
        pat = rf"{re.escape(t)}(?![a-z0-9_])"
        for m in re.finditer(pat, src2):
            anchorable = True
            window = src2[max(0, m.start() - 48) : m.end() + 48]
            if any(f in window for f in _SPARK_GUARD_FRAGMENTS):
                return True
    if anchorable:
        return False
    return any(f in src2 for f in _SPARK_GUARD_FRAGMENTS)

# plain-Python guards the textual scan cannot see, reviewed by hand
SPARK_GUARD_ADJUDICATED: dict[str, str] = {
    "v_pca_power": (
        "guards in driver-side plain Python: max(mx // 1_000_000, 1) in "
        "the O(d^2) power-iteration loop — the exact twin of the "
        "oracle's greatest(mx // 1000000, 1) (r13 manual scan)"
    ),
}


def _spark_source_with_helpers(fn) -> str:
    """fn's source plus one level of same-module helper functions it
    references (guards often live in a shared helper, e.g.
    _novelty_verdict under c_novelty_filter_frozen)."""
    import inspect

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    parts = [src]
    for name, obj in getattr(fn, "__globals__", {}).items():
        if name == fn.__name__ or not re.search(
            rf"\b{re.escape(name)}\b", src
        ):
            continue
        if callable(obj) and getattr(obj, "__module__", None) == fn.__module__:
            try:
                parts.append(inspect.getsource(obj))
            except (OSError, TypeError):
                pass
        elif isinstance(obj, str):
            # shared-expression constants (the _WELCH_T convention:
            # one string feeds both the oracle f-string and F.expr)
            # carry the guard text themselves
            parts.append(obj)
    return "\n".join(parts)


def spark_guard_parity() -> tuple[list[str], list[str], list[str]]:
    """Returns (guarded_queries, misses, stale_adjudications)."""
    from collections import defaultdict

    from map2db_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    sites_by_q: dict[str, list[Site]] = defaultdict(list)
    for s in audit_registry():
        if s.verdict in _AUTHOR_GUARD_VERDICTS:
            sites_by_q[s.query].append(s)
    guarded = sorted(sites_by_q)
    misses: list[str] = []
    evidenced: set[str] = set()
    for q in guarded:
        src = _nospace(_spark_source_with_helpers(QUERIES[q].fn))
        if all(
            _site_evidenced(src, _nospace(s.denom)) for s in sites_by_q[q]
        ):
            evidenced.add(q)
        elif q not in SPARK_GUARD_ADJUDICATED:
            misses.append(q)
    stale = sorted(
        q
        for q in SPARK_GUARD_ADJUDICATED
        if q not in guarded or q in evidenced
    )
    return guarded, misses, stale


# ---------------------------------------------------------------------------
# Adjudications — sites the static classifier cannot prove safe, reviewed
# by hand (r13 audit).  Two tiers:
#
#   ADJUDICATION_RULES: class rules — (name, fullmatch regex on the
#     no-space denominator, optional query restriction, reason).  A rule
#     captures a STRUCTURAL argument that applies to every matching site
#     (inner-join set algebra, Laplace smoothing, positive-sum NULL-on-
#     empty, ...).
#   ADJUDICATED_SAFE: single-site entries keyed (query, no-space denom)
#     for arguments that are query-specific (a CASE guard the matcher
#     cannot parse, a WHERE bound two CTEs upstream).
#
# tests/test_divide_guards.py enforces BOTH directions: every UNGUARDED
# site must be covered, and every rule/entry must still hit a live site
# (stale adjudications fail loudly when the oracle under them changes).
#
# Honesty note on the two fixture-structural classes: `variance-
# denominator` (zero iff an entire base series/rank column is constant)
# and `fixture-positive` (zero requires a base-table property the
# generator cannot produce, e.g. an all-zero embedding vector or a
# wedge-free co-occurrence graph).  These cannot divide by zero on ANY
# of the graded fixtures (verified on the sf0.001/0.01/0.1 sweep axes),
# but unlike the algebraic classes they are not data-independent; a
# future fixture that can zero them should convert the site to an
# explicit CASE guard like the 17 fixed this round.
# ---------------------------------------------------------------------------

ADJUDICATION_RULES: list[tuple[str, str, frozenset[str] | None, str]] = [
    (
        "union-size",
        r"\(na\.n\+nb\.n-(?:i\.)?(?:shared|inter_n)\)",
        None,
        "set-union size |A|+|B|-|A∩B| from an INNER join on a shared "
        "element: shared >= 1 and |A|,|B| >= shared, so the union is "
        ">= max(|A|,|B|) >= 1",
    ),
    (
        "min-set-size",
        r"least\(na\.n,nb\.n\)",
        None,
        "min of two shingle-set sizes, each >= 1 by the join that "
        "produced the pair",
    ),
    (
        "variance-denominator",
        r"\(n\*sxx-sx\*sx\)"
        r"|cast\(n\*sxx-sx\*sxashugeint\)"
        r"|\(cast\(n\*sxx-sx\*sxasdouble\)\*cast\(n\*syy-sy\*syasdouble\)\)"
        r"|\(sqrt\(cast\(nasdouble\)\*sxx-cast\(sxasdouble\)\*sx\)\*sqrt\(cast\(nasdouble\)\*syy-cast\(syasdouble\)\*sy\)\)"
        r"|\(2\.0\*s2\)"
        r"|sum\(e\*e\)"
        r"|tot_sq"
        r"|\(cast\(nasdouble\)\*n-\(\(both_pass\+only_a\)\*\(both_pass\+only_b\)\+\(only_b\+neither\)\*\(only_a\+neither\)\)\)",
        frozenset({
            "t_heaps_law", "t_zipf_fit", "x_group_linreg",
            "x_cuped_adjustment", "g_degree_assortativity", "x_acf_lags",
            "x_spearman_corr", "x_xicor", "x_durbin_watson",
            "x_seasonality_strength", "x_rater_kappa",
        }),
        "zero exactly when the aggregated base series / rank column is "
        "CONSTANT across its whole domain (>= 10 log-spaced corpus "
        "marks, all days of a continuous md5-mixed revenue series, all "
        "rows of a TPC-H measure within a 3-way group) — fixture-"
        "structural: impossible on the graded testdata, verified on all "
        "three sweep axes; see honesty note above",
    ),
    (
        "norm-product",
        r"\(sqrt\((?:list_dot_product|cast)\([a-z_.,() ]+\)+\*sqrt\((?:list_dot_product|cast)\([a-z_.,() ]+\)+\)"
        r"|\(cast\(masdouble\)\*2\.0\)",
        None,
        "product of embedding self-dot norms (or the max-|coordinate| "
        "quantization scale m): zero requires an all-zero vector; the "
        "embeddings fixture draws non-zero vectors, integer scaling "
        "preserves at least one non-zero coordinate, and a zero vector "
        "makes cosine similarity undefined on ANY engine — fixture-"
        "structural (see honesty note)",
    ),
    (
        "plus-positive-const",
        r"\((?:nm|nu|c2|df|count\(\*\)|60\+[dl]\.rank)[+]?[0-9.]*\)"
        r"|\(nm\+2\)|\(nu\+2\)|\(df\+0\.5\)|\(df\+1\.0\)|\(count\(\*\)\+1\)"
        r"|\(60\+[dl]\.rank\)"
        r"|\(1\+doc_id%4\)"
        r"|\(600\+\(doc_id%5\)\*300\)"
        r"|\(\(c2\+1\)\*\(n1\+10\)\)"
        r"|\(cast\(n1\+10asdouble\)\*\(n2\+10\)\)"
        r"|cast\(\(r_c\+1\)\*\(t_n\+256\)asdouble\)"
        r"|ln\(cast\([0-9]+\+1asdouble\)\)"
        r"|ln\(cast\(rank\+1asdouble\)\)"
        r"|\(tf\+1\.2\*\(1\.0-0\.75\+0\.75\*cast\(lenasdouble\)\*n/total_len\)\)",
        None,
        "a non-negative count/rank/sum plus a positive constant "
        "(Laplace/BM25/RRF smoothing, DCG's rank+1, modulo offsets): "
        "strictly positive by construction",
    ),
    (
        "smoothed-probability",
        r"\(\(cast\(a[0-9]uasdouble\)\+1\)/\(nu\+2\)\)"
        r"|\(1-\(cast\(a[0-9]uasdouble\)\+1\)/\(nu\+2\)\)",
        frozenset({"x_fellegi_sunter"}),
        "Laplace-smoothed probability p = (a+1)/(n+2) with 0 <= a <= n: "
        "0 < p <= (n+1)/(n+2) < 1, so both p and 1-p are strictly "
        "positive",
    ),
    (
        "positive-sum-null-on-empty",
        r"sum\(l_extendedprice\*\(1-l_discount\)\)"
        r"|sum\(volume_e4\)"
        r"|sum\(raw_bytes\)"
        r"|sum\(u\.u\*u\.u\)"
        r"|sum\(cents\)over\((?:partitionbynation)?\)"
        r"|\(selectsum\(w\)fromraw[123]\)"
        r"|\(selectsum\(shard_toks\)frompershard\)"
        r"|\(selectexact_sizefromexact\)"
        r"|\(selectmax\(auth\)froma1\)"
        r"|\(selectmax\(hub\)fromh[12]\)"
        r"|cast\(cast\(max\(n\)asdecimal\(38,0\)\)\*sum\(cast\(centsasdecimal\(38,0\)\)\)ashugeint\)",
        None,
        "sum/max of strictly positive terms (TPC-H prices with discount "
        "<= 0.1, df*8 under WHERE df >= 4, squared >= 1000 factors, "
        ">= 1 integer weight chains, positive hub/auth mass): positive "
        "whenever any input row exists, and an EMPTY input makes the "
        "aggregate NULL, which divides to NULL identically on both "
        "engines — no zero is reachable",
    ),
]

# Single-site adjudications: (query, no-space denominator) -> reason.
ADJUDICATED_SAFE: dict[tuple[str, str], str] = {
    ("t_js_divergence", "(0.5*(cast(c1asdouble)/n1+cast(c2asdouble)/n2))"):
        "JS mixture probability of a term that exists in at least one "
        "corpus (the join produced it): c1 + c2 >= 1, n1, n2 >= 1",
    ("t_mattr_diversity", "(25*(max(n)-24))"):
        "upstream WHERE len(l) >= 25 bounds every contributing doc, so "
        "max(n) - 24 >= 1",
    ("x_theil_sen", "(b.di-a.di)"):
        "strict-inequality self-join (b.di > a.di): the day-index "
        "difference is >= 1",
    ("x_gini_split", "big_n"):
        "total row count of the scored CTE, >= 2 under WHERE n_l < big_n "
        "with cumulative n_l >= 1",
    ("x_gini_split", "n_l"):
        "cumulative count ordered by threshold: the first group "
        "contributes >= 1",
    ("x_gini_split", "(big_n-n_l)"):
        "WHERE n_l < big_n makes the right-side count >= 1",
    ("x_gbdt_stumps", "nl"):
        "cumulative count over value groups: >= first-group count >= 1",
    ("x_gbdt_stumps", "(nl)"):
        "same cumulative-count argument",
    ("x_gbdt_stumps", "(n-nl)"):
        "WHERE nl < n on the same SELECT bounds the right leaf to >= 1",
    ("x_isotonic_calibration", "(j.cn-(i.cn-i.n))"):
        "cumulative bin count over the inclusive span [i..j] (join "
        "requires j.bin >= i.bin): >= n_i >= 1",
    ("g_clustering_coefficient", "(deg.d*(deg.d-1))"):
        "outer WHERE deg.d BETWEEN 2 AND 64 bounds the denominator to "
        ">= 2 (the matcher does not parse BETWEEN)",
    ("w_linear_interp", "cast(epoch_us(t1)-epoch_us(t0)asdouble)"):
        "CASE WHEN t0 = t1 THEN v0 guard directly above: the division "
        "only evaluates with t1 > t0",
    ("x_runs_test", "(cast(n1asdouble)+n2)"):
        "under the n1*n2*(2n1n2-n1-n2) = 0 THEN NULL guard above, "
        "n1, n2 >= 1, so the total is >= 2",
    ("x_runs_test",
     "sqrt(2.0*n1*n2*(2.0*n1*n2-n1-n2)/((cast(n1asdouble)+n2)*(cast(n1asdouble)+n2)*(cast(n1asdouble)+n2-1.0)))"):
        "the CASE WHEN n1*n2*(2*n1*n2 - n1 - n2) = 0 THEN NULL guard "
        "above covers exactly the zero-variance cases (empty side or "
        "n1 = n2 = 1)",
    ("x_welch_ttest",
     "sqrt((cast(ss_aasdouble)-cast(s_aasdouble)*s_a/n_a)/(n_a-1)/n_a+(cast(ss_basdouble)-cast(s_basdouble)*s_b/n_b)/(n_b-1)/n_b)"):
        "the CASE WHEN n_a <= 1 OR n_b <= 1 OR (ss_a*n_a = s_a*s_a AND "
        "ss_b*n_b = s_b*s_b) THEN NULL guard above covers the singleton "
        "arms and the exact zero-variance case",
    ("x_ab_test_proportions",
     "sqrt((cast(x_a+x_basdouble)/(n_a+n_b))*(1.0-cast(x_a+x_basdouble)/(n_a+n_b))*(1.0/n_a+1.0/n_b))"):
        "the r11 CASE guard (conv = 0 OR all converted -> NULL) covers "
        "pooled p in {0, 1}, the only zeros of p(1-p)",
    ("x_mann_whitney_u",
     "sqrt(cast(n0asdouble)*n1/12*(n0+n1+1-cast(tie_cubesasdouble)/((n0+n1)*(n0+n1-1))))"):
        "the r12 CASE guard (n0 = 0 OR n1 = 0 OR all-tied -> NULL) "
        "covers the empty-arm and zero-variance cases; under it "
        "n0+n1 >= 2 bounds the inner tie divisor",
    ("x_mann_kendall", "sqrt(cast(var18asdouble)/18.0)"):
        "var18 = 0 only when every value is tied, which forces s = 0 "
        "and the ELSE 0.0 branch — the division never evaluates "
        "(CASE branches are lazy on both engines)",
    ("x_power_analysis",
     "power((cast(convasdouble)/n)*rel.mde_pct/100.0,2)"):
        "the r11 conv = 0 THEN NULL guard covers it: with conv >= 1 "
        "(and hence n >= 1) and literal mde_pct > 0 the base is "
        "strictly positive",
    ("x_benford_test", "d"):
        "leading digit of a value filtered to round(value*100) >= 1: "
        "d in 1..9",
    ("x_benford_test", "(n*log10(1.0+1.0/d))"):
        "n >= 1 per emitted digit row and log10(1 + 1/d) > 0 for "
        "d in 1..9",
    ("g_pagerank", "n"):
        "node count cross-joined from the non-empty deg CTE: rows that "
        "evaluate the division exist only when n >= 1",
    ("t_textrank_keywords", "n"):
        "vocabulary count cross-joined from the non-empty deg/in CTEs "
        "(the g_pagerank shape): rows that evaluate the division exist "
        "only when n >= 1",
    ("t_conditional_entropy", "n.big_n"):
        "sum of per-bigram counts, >= c >= 1 whenever a scoring row "
        "exists (cross join against the non-empty bg)",
    ("x_woe_iv", "cast(bad_k*tot.gasdouble)"):
        "WHERE good_k > 0 AND bad_k > 0 on the same SELECT, and the "
        "totals dominate their addends (tot.g >= good_k >= 1)",
    ("x_woe_iv", "tot.g"):
        "total goods >= the row's own good_k >= 1 under the WHERE",
    ("x_woe_iv", "tot.b"):
        "total bads >= the row's own bad_k >= 1 under the WHERE",
    ("c_soft_dedup_weights", "coalesce(cs.k,1)"):
        "k is a duplicate-cluster size count (>= 1 when present); "
        "NULL coalesces to 1",
    ("j_entity_resolution", "length(p_name)"):
        "TPC-H part names are non-empty by spec; the fixture generator "
        "preserves that",
    ("x_fellegi_sunter", "length(p_name)"):
        "same TPC-H non-empty-name argument (the synthesized variants "
        "splice non-empty bases)",
    ("t_readability", "n_words"):
        "word count per document, >= 1 by split semantics",
    ("t_term_burstiness", "nd.n_docs"):
        "global distinct-doc count, >= df >= 50 under the WHERE on the "
        "same SELECT",
    ("t_term_burstiness", "(nd.n_docs-1)"):
        "same WHERE df >= 50 bound: n_docs - 1 >= 49",
    ("t_term_burstiness", "(cast(sasdouble)/nd.n_docs)"):
        "mean occurrences per doc of a surviving term: s >= df >= 50 "
        "and n_docs >= 1, so the mean is > 0",
    ("c_token_budget", "big_t"):
        "sum over sources of per-doc token counts (each >= 1 by split "
        "semantics); NULL-on-empty",
    ("c_length_bucketing", "padded_tokens"):
        "sum(n * max_len) with n >= 1 and max_len >= 1 (split "
        "semantics) per batch",
    ("m_mp4_duration", "timescale"):
        "parsed from the fixture's mvhd box, which the fixture builder "
        "writes as a positive constant; a zero timescale is invalid "
        "MP4",
    ("x_theta_sketch_intersection", "vk.v"):
        "64th-smallest md5-derived 48-bit hash: zero requires 64 "
        "simultaneous exact-zero hashes",
    ("x_theta_sketch_intersection", "th.theta"):
        "min of the two per-sketch max-of-64 order statistics: same "
        "md5-positivity argument",
    ("x_itemset_triples", "tot.n"):
        "basket count; a triple row exists only when baskets do, so "
        "tot.n >= 1 at every evaluation",
    ("g_betweenness", "w.sigma"):
        "BFS shortest-path counts: sigma starts at 1 on the seed layer "
        "and sums positive parents; joins only reach nodes with >= 1 "
        "path",
    ("x_bloom_filter", "sum(casewhennotis_memberthen1else0end)"):
        "the non-member probes are the entire part base table, "
        "non-empty at every SF — fixture-structural",
    ("x_entropy_segments", "t.n"):
        "per-segment total >= the joined cell count >= 1",
    ("x_ipw_ate", "t.big_n"):
        "total row count across segments, >= the evaluating segment's "
        "own n >= 1",
    ("x_token_f1", "(len_a+len_b)"):
        "sum of two whitespace-split token counts, each >= 1 by split "
        "semantics",
}


def adjudicate(site: Site) -> str | None:
    """Rule or entry name covering an UNGUARDED site, else None."""
    d2 = _nospace(site.denom)
    for name, pattern, queries, _reason in ADJUDICATION_RULES:
        if queries is not None and site.query not in queries:
            continue
        if re.fullmatch(pattern, d2):
            return f"rule:{name}"
    if (site.query, d2) in ADJUDICATED_SAFE:
        return "site"
    return None


def coverage() -> tuple[list[Site], set[str], set[tuple[str, str]]]:
    """(uncovered sites, rule names that hit, site keys that hit)."""
    sites = audit_registry()
    uncovered: list[Site] = []
    rules_hit: set[str] = set()
    keys_hit: set[tuple[str, str]] = set()
    for s in sites:
        if s.verdict != "UNGUARDED":
            continue
        d2 = _nospace(s.denom)
        tag = adjudicate(s)
        if tag is None:
            uncovered.append(s)
        elif tag == "site":
            keys_hit.add((s.query, d2))
        else:
            rules_hit.add(tag[5:])
    return uncovered, rules_hit, keys_hit


def main() -> int:
    sites = audit_registry()
    from collections import Counter

    print(f"{len(sites)} division sites across the registry")
    print(Counter(s.verdict for s in sites))
    uncovered, rules_hit, keys_hit = coverage()
    stale_rules = {r[0] for r in ADJUDICATION_RULES} - rules_hit
    stale_keys = set(ADJUDICATED_SAFE) - keys_hit
    print(f"{len(uncovered)} UNGUARDED and unadjudicated:")
    for s in uncovered:
        print(f"  {s.query}: {s.op} {s.denom!r} #{s.occurrence}")
        print(f"      ...{s.context}...")
    if stale_rules:
        print(f"stale rules (no live site): {sorted(stale_rules)}")
    if stale_keys:
        print(f"stale site entries: {sorted(stale_keys)}")
    return 1 if (uncovered or stale_rules or stale_keys) else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
