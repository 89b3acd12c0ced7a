"""Relational operator combinators (the reference's node language)."""

from asritha_metamorphetl_spark.operators.nodes import (
    agg_node,
    exp_node,
    fil_node,
    jnr_node,
    sq_node,
)

__all__ = ["sq_node", "fil_node", "jnr_node", "agg_node", "exp_node"]
