"""Physical-plan introspection helpers.

Used by tests (and during development) to assert the plan properties
that matter at 100 TB: filters pushed to the scan, columns pruned,
dimension joins broadcast, codegen spans intact. `.explain()` prints;
these return the plan text so properties can be *asserted*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    txt = plan_text(df)
    return "PushedFilters: [" in txt and "PushedFilters: []" not in txt


def _single_plan(df: DataFrame) -> str:
    # "simple" mode: one line per operator ("formatted" repeats each node
    # in a detail section). After execution AQE prints Final AND Initial
    # plans — keep only the final one to avoid double counting.
    txt = plan_text(df, "simple")
    return txt.split("== Initial Plan ==")[0]


def broadcast_join_count(df: DataFrame) -> int:
    return _single_plan(df).count("BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return _single_plan(df).count("SortMergeJoin")


def has_wholestage_codegen(df: DataFrame) -> bool:
    # Under AQE the un-executed "formatted" plan shows no codegen spans;
    # "codegen" mode compiles the current plan and names its subtrees.
    return "WholeStageCodegen" in plan_text(df, "codegen")


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    txt = plan_text(df)
    cols: set[str] = set()
    for line in txt.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1]
            for part in schema.replace("struct<", "").split(","):
                name = part.strip().split(":", 1)[0].strip("<> ")
                if name:
                    cols.add(name)
    return sorted(cols)


def global_sorted_windows(df: DataFrame) -> list[str]:
    """Order specs of Window nodes that sort WITHOUT a partition key —
    the single-task shape the repo-wide census gates. A physical
    Window node prints ``Window [funcs], [partSpec], [orderSpec]``;
    with no partition the middle list is gone, leaving two top-level
    bracket groups whose last holds ASC/DESC sort keys."""
    out: list[str] = []
    for line in _single_plan(df).splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        groups, depth, buf = [], 0, []
        for ch in line[idx + len("Window ") :]:
            if ch == "[":
                depth += 1
                if depth == 1:
                    buf = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                    continue
            if depth >= 1:
                buf.append(ch)
        if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
            out.append(groups[1])
    return out
