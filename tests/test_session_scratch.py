"""Local-master shuffle scratch policy (session._local_scratch_dir):
local-mode shuffle/spill files are intra-run scratch and belong on
tmpfs when the box has one — round 11 measured the stream/tx
micro-batch queries' wall tracking the host's DISK-load canary purely
through blockmgr writes under /tmp. A non-local master must never get
the tmpfs default (cluster managers own executor local dirs)."""

import os
from unittest import mock

from maillogsentinel_spark.session import _local_scratch_dir


def test_env_override_wins():
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_LOCAL_DIR": "/x/y"}):
        assert _local_scratch_dir() == "/x/y"


def test_tmpfs_default_when_present():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)
        if os.path.isdir("/dev/shm"):
            assert _local_scratch_dir() == "/dev/shm"


def test_no_tmpfs_means_no_default():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_LOCAL_DIR", None)
        with mock.patch("os.path.isdir", return_value=False):
            assert _local_scratch_dir() is None


def test_live_session_uses_tmpfs_scratch(spark):
    # conftest's session is local-master; with /dev/shm present the
    # policy must have applied (blockmgr/spill land on tmpfs).
    if os.path.isdir("/dev/shm"):
        assert spark.conf.get("spark.local.dir") == "/dev/shm"
