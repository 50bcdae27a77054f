"""compat.pbshim: the google.protobuf bridge that un-skips the TWS tests.

The trap this pins: Spark workers get ``spark-core_*.jar`` on PYTHONPATH,
and its ``google/protobuf/*.proto`` resource entries make zipimport expose
``google.protobuf`` as an *empty namespace package* — importable, useless.
``have_real_protobuf()`` must not mistake that for a real distribution
(the round-5 bug: install() no-op'd, every TWS worker crashed on
``from google.protobuf import descriptor``).
"""

from __future__ import annotations

import glob
import subprocess
import sys

from spark_signals.compat import pbshim


def test_have_real_protobuf_rejects_jar_namespace_portion():
    """With only the spark-core jar on path, google.protobuf imports as a
    namespace package; have_real_protobuf must say False so install()
    proceeds to bridge. Run in a subprocess for a clean import state."""
    jars = glob.glob("/opt/spark*/jars/spark-core_*.jar") + glob.glob(
        "/opt/spark/jars/spark-core_*.jar"
    )
    if not jars:
        return  # no spark dist layout; nothing to pin
    code = (
        "import sys; sys.path.insert(1, %r)\n"  # after '' (cwd), like a worker
        "from spark_signals.compat import pbshim\n"
        "import importlib.util\n"
        "spec = importlib.util.find_spec('google.protobuf')\n"
        "assert spec is not None and spec.origin is None, 'expected namespace portion'\n"
        "assert not pbshim.have_real_protobuf()\n"
        "assert pbshim.install()\n"
        "import google.protobuf\n"
        "from google.protobuf import descriptor  # the import TWS gencode does\n"
        "print('OK')\n"
    ) % (jars[0],)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


def test_install_idempotent_and_proto_roundtrip():
    assert pbshim.install()
    assert pbshim.install()  # second call is a no-op, still True
    from pyspark.sql.streaming.proto import StateMessage_pb2 as SM

    req = SM.StateRequest(version=2)
    back = SM.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2


def test_worker_env_paths_exist():
    env = pbshim.worker_env()
    first = env["PYTHONPATH"].split(":")[0]
    assert first.endswith("vendor/pbshim")
    import os

    assert os.path.isfile(os.path.join(first, "sitecustomize.py"))
