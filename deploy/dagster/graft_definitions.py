"""Dagster glue for the graft Spark job graph.

The reference defines its 7-job menu as Dagster asset jobs over
ingestion + dbt + ML assets (reference ``dagster/repo.py:88-170``).
In the Spark engine the same DAG lives in ONE submittable class —
``graft.finance.JobsMain`` maps each reference job name to its
composition of transform/train/predict steps (the table in its
scaladoc). This module is the orchestration half: a Dagster
``Definitions`` whose ops shell to ``spark-submit`` with the job name,
so the reference's Dagster deployment (including the UI backend's
GraphQL ``launch_job`` client, which selects jobs BY NAME) keeps
working against the Spark engine unchanged.

Uses only the public ``dagster`` API. Not executed in the build
container (no Python deps there); exercised structurally by
``tools/check_dagster_glue.py`` and behaviorally by the Scala side
(``JobsMainSpec`` launches all 7 names end-to-end).
"""
import os
import subprocess

from dagster import Definitions, In, Nothing, OpExecutionContext, job, op

GRAFT_JAR = os.environ.get("GRAFT_JAR", "/opt/graft/graft.jar")
GRAFT_WAREHOUSE = os.environ.get("GRAFT_WAREHOUSE", "/opt/graft/warehouse")
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def _submit(context: OpExecutionContext, job_name: str) -> None:
    """Launch one JobsMain composition; stream logs; fail the op on rc!=0."""
    cmd = [
        SPARK_SUBMIT,
        "--class", "graft.finance.JobsMain",
        GRAFT_JAR,
        GRAFT_WAREHOUSE,
        job_name,
    ]
    context.log.info("launching: %s", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.stdout:
        context.log.info(proc.stdout[-20000:])
    if proc.stderr:
        context.log.info(proc.stderr[-20000:])
    if proc.returncode != 0:
        raise RuntimeError(f"{job_name} failed with exit code {proc.returncode}")


# One op per JobsMain step family. The intra-run dependency edges below
# mirror the reference's asset selections: ingestion feeds transforms,
# transforms feed train/predict (repo.py's `.downstream()` closures).

@op
def ingest_and_predict(context: OpExecutionContext) -> Nothing:
    """simplefin_financial_data.downstream() (repo.py:103-109): the
    poll-and-load boundary plus prediction. JobsMain's transform jobs read
    the raw table the connector appended; the connector itself runs via the
    S1/S2 extractor (graft.finance.connector.SimplefinConnector)."""
    _submit(context, "2_ingest_and_predict")


@op(ins={"after": In(Nothing)})
def run_all_models(context: OpExecutionContext) -> Nothing:
    """dbt_models (repo.py:68-82) -> JobsMain 3_run_all_dbt_models."""
    _submit(context, "3_run_all_dbt_models")


@op(ins={"after": In(Nothing)})
def refresh_validated_retrain_repredict(context: OpExecutionContext) -> None:
    """fct_validated_trxns.downstream() (repo.py:113-119)."""
    _submit(context, "4_refresh_validated_retrain_repredict")


@op
def full_refresh_validated_retrain_repredict(context: OpExecutionContext) -> None:
    _submit(context, "5_full_refresh_validated_retrain_repredict")


@op
def rebuild_historic_data(context: OpExecutionContext) -> None:
    _submit(context, "z_a_rebuild_historic_data")


@op
def full_refresh_validated_trxns(context: OpExecutionContext) -> None:
    _submit(context, "z_b_full_refresh_validated_trxns")


# The 7 launchable jobs, named EXACTLY as repo.py names them so the UI
# backend's launch-by-name GraphQL client resolves them unmodified
# (ui/backend/services/dagster_client.py:76, constants JOB_*).

@job(name="1_dagster_init")
def job_dagster_init():
    # repo.py:88-100's init selection, as explicit op edges: ingest &
    # predict -> run all models -> refresh validated + retrain + re-predict
    refresh_validated_retrain_repredict(
        after=run_all_models(after=ingest_and_predict()))


@job(name="2_ingest_and_predict")
def job_ingest_and_predict():
    ingest_and_predict()


@job(name="3_run_all_dbt_models")
def job_run_all_models():
    run_all_models()


@job(name="4_refresh_validated_retrain_repredict")
def job_refresh_validated():
    refresh_validated_retrain_repredict()


@job(name="5_full_refresh_validated_retrain_repredict")
def job_full_refresh_validated_retrain():
    full_refresh_validated_retrain_repredict()


@job(name="z_a_rebuild_historic_data")
def job_rebuild_historic():
    rebuild_historic_data()


@job(name="z_b_full_refresh_validated_trxns")
def job_full_refresh_validated():
    full_refresh_validated_trxns()


defs = Definitions(
    jobs=[
        job_dagster_init,
        job_ingest_and_predict,
        job_run_all_models,
        job_refresh_validated,
        job_full_refresh_validated_retrain,
        job_rebuild_historic,
        job_full_refresh_validated,
    ],
)
