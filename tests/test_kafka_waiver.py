"""Machine-checked standing waiver for S1 physical Kafka/Debezium
ingestion (SURVEY §2.1; round-9 verdict item 7).

The reference ingests Postgres CDC through a real Kafka broker with a
Debezium connector (/root/reference/debezium/postgres-connector.json,
docker-compose services). This sandbox has no broker binary, no
spark-sql-kafka connector jar, no Python Kafka client, and no network to
fetch any — re-verified by hand every round since round 1. This test
folds that probe into the suite: while the environment stays closed it
SKIPS with the probe's findings in the skip message (the waiver's
evidence), and the moment any capability appears it FAILS loudly so the
waiver must be re-litigated instead of silently standing."""

from __future__ import annotations

import glob
import importlib.util
import os
import shutil
import socket

import pytest


def _probe_environment() -> dict[str, str | None]:
    """Each capability -> None if absent, else a description of what was
    found (which invalidates the waiver)."""
    found: dict[str, str | None] = {}

    broker = next(
        (
            shutil.which(n)
            for n in ("kafka-server-start.sh", "kafka-server-start", "redpanda")
            if shutil.which(n)
        ),
        None,
    )
    found["broker_binary"] = broker

    jar_dirs = []
    try:
        import pyspark

        jar_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    jar_dirs.append(os.path.expanduser("~/.ivy2/jars"))
    jars = [
        j
        for d in jar_dirs
        for j in glob.glob(os.path.join(d, "*sql-kafka*.jar"))
        + glob.glob(os.path.join(d, "*kafka-clients*.jar"))
    ]
    found["connector_jar"] = jars[0] if jars else None

    client = next(
        (m for m in ("kafka", "confluent_kafka") if importlib.util.find_spec(m)),
        None,
    )
    found["python_client"] = client

    net = None
    for host in ("repo1.maven.org", "archive.apache.org"):
        try:
            socket.create_connection((host, 443), timeout=2).close()
            net = host
            break
        except OSError:
            continue
    found["network"] = net
    return found


def test_kafka_waiver_is_still_warranted():
    found = _probe_environment()
    present = {k: v for k, v in found.items() if v}
    assert not present, (
        "Kafka capability appeared in the sandbox — the S1 physical-"
        f"ingestion waiver no longer stands: {present}. Wire the "
        "option-complete adapter (streaming/pipeline.py:67) to the real "
        "source and retire the waiver."
    )
    pytest.skip(
        "S1 physical Kafka/Debezium ingestion waived — probe found no "
        "broker binary, no spark-sql-kafka/kafka-clients jar (pyspark "
        "jars + ivy cache), no kafka/confluent_kafka Python client, and "
        "no outbound network (repo1.maven.org, archive.apache.org). The "
        "option-complete adapter + file-stream twin stands in "
        "(streaming/pipeline.py)."
    )
