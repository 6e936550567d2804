"""Re-identification risk audits for structured releases (k-anonymity family).

The text path already redacts direct identifiers (functions/text.redact_pii);
this is the STRUCTURED-data companion: before releasing a table keyed on
quasi-identifiers (the attribute combinations that re-identify people when
linked against an outside dataset — Sweeney's k-anonymity, IJUFKS 2002), audit
how small the equivalence classes get and how little the sensitive attribute
varies inside them (l-diversity, Machanavajjhala TKDD 2007 — a k-anonymous
class is still a leak if everyone in it shares the sensitive value).

Scale shape: ONE map-side-combined groupBy reduces the corpus to its
quasi-identifier class domain (count + count-distinct-sensitive per class),
then one single-row aggregate over class rows. The corpus never shuffles
twice and nothing is collected; cost is dominated by the one class-domain
aggregation exactly like any other groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from plenario_mapper_spark.functions import parity as PAR


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str | Column,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """One-row re-identification risk summary for a planned release.

    Columns: n_rows, n_classes (distinct quasi-identifier combinations),
    min_class_size / k_anonymity (they are the same number — the k the
    release actually achieves), n_classes_below_k, rows_at_risk (rows in
    classes smaller than k — the suppression/generalization cost of reaching
    k), risk_rate, min_l_diversity (min distinct sensitive values in any
    class), n_classes_below_l. All exact integers except risk_rate (one
    final double division), so the audit is engine-exact.
    """
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").cast("long").alias("_n"),
        F.countDistinct(s).cast("long").alias("_l"),
    )
    return classes.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).cast("long").alias(
            "n_classes_below_k"
        ),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("_l").cast("long").alias("min_l_diversity"),
        F.sum(F.when(F.col("_l") < l, 1).otherwise(0)).cast("long").alias(
            "n_classes_below_l"
        ),
    ).select(
        "n_rows",
        "n_classes",
        "k_anonymity",
        "n_classes_below_k",
        "rows_at_risk",
        PAR.round6(F.col("rows_at_risk").cast("double") / F.col("n_rows").cast("double")).alias("risk_rate"),
        "min_l_diversity",
        "n_classes_below_l",
    )
