"""Snowball-lite Spanish stemmer for the $text search surface.

The reference's Mongo text index stems per-language server-side
(reference streamlit_app.py:147 — db `transcripciones` holds Spanish
legal text), so "providencias" finds documents containing
"providencia". The compat contract (B1, compat/documents.py) pins the
unstemmed OR-of-terms match; this module adds the documented stemming
extension behind ``search_text(..., stem=True)``.

Design: ONE ordered rule table drives three generated implementations —

  * ``stem_py``     — Python, used to fold the query terms client-side;
  * ``stem_col``    — a pure Catalyst Column expression (F.when chain
                      inside ``F.transform`` over the tokens array) so
                      corpus-side stemming is JVM-only, whole-stage-
                      codegen'd, applied at ingest into a ``stems``
                      column — never a per-query UDF;
  * ``stem_sql``    — the identical rule chain as a DuckDB CASE
                      expression, so stemmed queries stay oracle-
                      checkable.

Because all three are generated from the same table, engine parity is
by construction (property-tested in tests/test_documents.py).

This is deliberately NOT full Snowball (no R1/R2/RV regions): a
longest-first single-suffix strip per step, two steps (plural, then
derivational/verbal), each guarded by a minimum remaining stem length.
Tokens are already lowercased + accent-folded by compat.documents.
tokenize, so the rules are written accentless ("cion", not "ción").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_VOWELS = "aeiou"
# consonants that take "-es" in the plural (papel->papeles, ley->leyes);
# NOT 's' — "-ses" words (clase->clases) pluralize with bare "-s", so
# they fall through to the vowel+s rule and keep their final 'e'.
_ES_CONSONANTS = "lrndjzy"

# (suffix, replacement, min_stem, guard) — ordered, longest/most-
# specific first; min_stem = minimum chars that must REMAIN after
# stripping the suffix (before appending the replacement). guard is
# None or ("in"|"not_in", chars) constraining the character immediately
# before the suffix.
#
# Step 1 — number (plural):
#   naciones->nacion  veces->vez  papeles->papel  providencias->providencia
_Guard = tuple[str, str] | None
_PLURAL_RULES: list[tuple[str, str, int, _Guard]] = [
    ("ciones", "cion", 2, None),
    ("siones", "sion", 2, None),
    ("ces", "z", 2, None),
    ("es", "", 3, ("in", _ES_CONSONANTS)),  # papeles->papel, leyes->ley
    ("s", "", 3, ("in", _VOWELS)),  # providencias->providencia, clases->clase
]

# Step 2 — derivation/verb endings, applied to the step-1 output:
#   pensamiento->pens  transformacion->transform  legalmente->legal
#   legalidad->legal  estudiando->estudi  providenciar->providenci
_DERIV_RULES: list[tuple[str, str, int, _Guard]] = [
    ("amiento", "", 3, None),
    ("imiento", "", 3, None),
    ("acion", "", 3, None),
    ("ucion", "", 3, None),
    ("cion", "", 2, None),
    ("sion", "", 2, None),
    ("mente", "", 3, None),
    ("idad", "", 3, None),
    ("iendo", "", 3, None),
    ("ando", "", 3, None),
    ("ar", "", 4, None),
    ("er", "", 4, None),
    ("ir", "", 4, None),
]


def _apply_step_py(token: str, rules) -> str:
    for suffix, repl, min_stem, guard in rules:
        keep = len(token) - len(suffix)
        if keep < min_stem or not token.endswith(suffix):
            continue
        if guard is not None:
            mode, chars = guard
            prev_ok = keep > 0 and token[keep - 1] in chars
            if (mode == "in") != prev_ok:
                continue
        return token[:keep] + repl
    return token


def stem_py(token: str) -> str:
    """Stem one already-folded (lowercase, accentless) token."""
    return _apply_step_py(_apply_step_py(token, _PLURAL_RULES), _DERIV_RULES)


def _apply_step_col(t: Column, rules) -> Column:
    out = t
    # build the when-chain back-to-front so the FIRST rule in the table
    # wins, matching the Python early-return
    for suffix, repl, min_stem, guard in reversed(rules):
        keep = F.length(t) - F.lit(len(suffix))
        cond = t.endswith(suffix) & (keep >= F.lit(min_stem))
        prev = t.substr(keep, F.lit(1))
        if guard is not None:
            mode, chars = guard
            in_set = prev.isin(*chars)
            cond = cond & (in_set if mode == "in" else ~in_set)
        stripped = t.substr(F.lit(1), keep)
        replaced = F.concat(stripped, F.lit(repl)) if repl else stripped
        out = F.when(cond, replaced).otherwise(out)
    return out


def stem_col(t: Column) -> Column:
    """The same two-step strip as ``stem_py``, as a pure Catalyst
    expression over one token Column (no UDF)."""
    return _apply_step_col(_apply_step_col(t, _PLURAL_RULES), _DERIV_RULES)


def stem_tokens(tokens: Column) -> Column:
    """Element-wise stem of a tokens array Column."""
    return F.transform(tokens, stem_col)


def _apply_step_sql(expr: str, rules) -> str:
    branches = []
    for suffix, repl, min_stem, guard in rules:
        cond = (
            f"ends_with({expr}, '{suffix}') "
            f"AND length({expr}) - {len(suffix)} >= {min_stem}"
        )
        prev = f"substr({expr}, length({expr}) - {len(suffix)}, 1)"
        if guard is not None:
            mode, chars = guard
            cs = ", ".join(f"'{c}'" for c in chars)
            op = "IN" if mode == "in" else "NOT IN"
            cond += f" AND {prev} {op} ({cs})"
        result = f"left({expr}, length({expr}) - {len(suffix)})"
        if repl:
            result = f"{result} || '{repl}'"
        branches.append(f"WHEN {cond} THEN {result}")
    return "CASE " + " ".join(branches) + f" ELSE {expr} END"


def stem_preimages(term: str) -> list[str]:
    """EXACT preimage set of a stemmed term: every token T with
    ``stem_py(T) == term``.

    This inverts the two strip steps compositionally — for each rule
    (suffix, repl), any x with that rule applied ends in ``suffix`` and
    equals ``base[:-len(repl)] + suffix`` — then FILTERS every candidate
    through ``stem_py`` itself, which re-imposes guards, min-stem
    bounds, and rule precedence, so equivalence is by construction.

    Why: a stemmed search over a corpus with no materialized ``stems``
    column would otherwise evaluate the ~36-branch strip expression on
    every token of every row. Expanding the QUERY side instead turns
    the scan predicate into a plain ``arrays_overlap`` against a
    bounded literal array (|rules|² candidates per term, typically
    <100) — per-row work becomes hash-set membership, the same plan
    shape as the unstemmed B1 search. The sorted output keeps plans
    deterministic.
    """

    def invert_step(base: str, rules) -> list[str]:
        out = [base]
        for suffix, repl, _min_stem, _guard in rules:
            if repl:
                if base.endswith(repl):
                    out.append(base[: len(base) - len(repl)] + suffix)
            else:
                out.append(base + suffix)
        return out

    candidates = set()
    for mid in invert_step(term, _DERIV_RULES):
        candidates.update(invert_step(mid, _PLURAL_RULES))
    return sorted(t for t in candidates if stem_py(t) == term)


def stems_sql(list_expr: str, var: str = "t") -> str:
    """DuckDB SQL twin of ``stem_py`` applied element-wise to a token-
    list expression — generated from the SAME rule table, so the oracle
    checks the exact engine semantics. The two steps are two nested
    ``list_transform``s (inlining step 1 into every step-2 operand
    reference would expand the CASE ~50x)."""
    step1 = f"list_transform({list_expr}, {var} -> {_apply_step_sql(var, _PLURAL_RULES)})"
    return f"list_transform({step1}, {var} -> {_apply_step_sql(var, _DERIV_RULES)})"
