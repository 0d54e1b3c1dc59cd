"""Higher-order-function expression helpers.

``let_once`` exists because Catalyst's CollapseProject inlines a select
alias into EVERY reference — a rewrite, not a binding. ProjectExec's
runtime subexpression elimination usually dedups the copies, but
GenerateExec (explode) has no CSE, and a reference from inside a
higher-order-function lambda body re-evaluates per ELEMENT. The round-9
case: the winnowing window lambda re-ran an m-element md5 transform per
window (O(m^2) per row, ~190 s at sf0.1), and ``shingles_df`` re-split
the document text once per shingle (6x the explode cost). Only lambda
VARIABLES are bound once per enclosing evaluation — so the wrapper
routes the subtree through one, making evaluate-once a structural
property of the plan instead of an executor optimization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_once(value: Column, body) -> Column:
    """Bind ``value`` once per row and evaluate ``body(var)`` over it —
    a let-binding encoded as a single-element ``transform``. Use it
    around any expensive subtree that is referenced more than once,
    consumed under an explode, or read from inside a lambda body."""
    return F.element_at(F.transform(F.array(value), body), 1)
