#!/usr/bin/env python3
"""Structural check of deploy/dagster/graft_definitions.py without
importing dagster (not installed in the build container): parses the AST
and asserts the glue exposes exactly the reference's 7 job names
(reference dagster/repo.py:88-170), every @job body only calls defined
@op functions, and the Definitions lists all 7 jobs.
"""
import ast
import sys
from pathlib import Path

EXPECTED_JOBS = {
    "1_dagster_init",
    "2_ingest_and_predict",
    "3_run_all_dbt_models",
    "4_refresh_validated_retrain_repredict",
    "5_full_refresh_validated_retrain_repredict",
    "z_a_rebuild_historic_data",
    "z_b_full_refresh_validated_trxns",
}

GLUE = Path(__file__).resolve().parent.parent / "deploy/dagster/graft_definitions.py"


def decorator_kind(dec):
    """Return 'op', 'job' or None, plus the name= kwarg for @job(name=...)."""
    if isinstance(dec, ast.Name):
        return dec.id, None
    if isinstance(dec, ast.Call) and isinstance(dec.func, ast.Name):
        name_kw = next((k.value.value for k in dec.keywords
                        if k.arg == "name" and isinstance(k.value, ast.Constant)), None)
        return dec.func.id, name_kw
    return None, None


def main():
    tree = ast.parse(GLUE.read_text())
    ops, jobs, job_funcs = set(), {}, {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            for dec in node.decorator_list:
                kind, name_kw = decorator_kind(dec)
                if kind == "op":
                    ops.add(node.name)
                elif kind == "job":
                    jobs[name_kw or node.name] = node.name
                    job_funcs[node.name] = node

    errors = []
    if set(jobs) != EXPECTED_JOBS:
        errors.append(f"job menu mismatch:\n  missing: {sorted(EXPECTED_JOBS - set(jobs))}"
                      f"\n  extra:   {sorted(set(jobs) - EXPECTED_JOBS)}")

    # every call inside a @job body resolves to a defined @op
    for jname, fname in jobs.items():
        # walk the BODY only — the decorator itself is a job(...) call
        calls = {c.func.id for stmt in job_funcs[fname].body for c in ast.walk(stmt)
                 if isinstance(c, ast.Call) and isinstance(c.func, ast.Name)}
        unknown = calls - ops
        if unknown:
            errors.append(f"job {jname}: calls undefined ops {sorted(unknown)}")
        if not calls:
            errors.append(f"job {jname}: empty body")

    # Definitions(jobs=[...]) lists every job function exactly once
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "Definitions"):
            listed = [e.id for k in node.keywords if k.arg == "jobs"
                      for e in k.value.elts if isinstance(e, ast.Name)]
            if sorted(listed) != sorted(jobs.values()):
                errors.append(f"Definitions jobs {sorted(listed)} != @job functions "
                              f"{sorted(jobs.values())}")

    if errors:
        print("FAIL")
        for e in errors:
            print(" -", e)
        return 1
    print(f"OK: {len(jobs)} jobs, {len(ops)} ops, menu matches dagster/repo.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
