"""LCOM4 cohesion (reference A6,
``analysis/collectors/cohesion.py:90-330``): connected components of
the per-class method↔attribute usage graph; LCOM4 = component count.

Per-class graphs are tiny (methods × attributes of ONE class), so the
right Spark shape is `applyInPandas` grouped by class — union-find
runs where the class's rows already live, classes process in
parallel, and nothing iterates on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _lcom4(edges: list[tuple[str, str]]) -> int:
    """Union-find over method→attribute edges; components among
    methods (isolated methods count as their own component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    methods = set()
    for m, attr in edges:
        methods.add(f"m:{m}")
        if attr:
            union(f"m:{m}", f"a:{attr}")
    roots = {find(m) for m in methods}
    return len(roots)


def lcom4(
    usages: DataFrame,
    class_col: str = "class_name",
    method_col: str = "method",
    attr_col: str = "attr",
) -> DataFrame:
    """(class_name, lcom4, n_methods) from a (class, method, attr)
    usage edge list. attr may be null (method touching no state)."""
    import pandas as pd

    def per_class(pdf: "pd.DataFrame") -> "pd.DataFrame":
        edges = [
            (str(m), str(a) if pd.notna(a) else "")
            for m, a in zip(pdf[method_col], pdf[attr_col])
        ]
        return pd.DataFrame(
            {
                "class_name": [pdf[class_col].iloc[0]],
                "lcom4": [_lcom4(edges)],
                "n_methods": [pdf[method_col].nunique()],
            }
        )

    return usages.groupBy(class_col).applyInPandas(
        per_class, schema="class_name string, lcom4 long, n_methods long"
    )
