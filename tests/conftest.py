from __future__ import annotations

import pytest

from mrsboraetl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Fixture data is hundreds of rows; Janino compilation + JIT of the huge
    # generated methods (28-ladder decode, blob packing) costs far more than
    # interpreted evaluation at this size — the full suite went from
    # >590s (timeout) to minutes with codegen off.  Codegen paths are
    # exercised by tests/oracle_check.py and bench.py, which run at real
    # scale factors with the production session config.
    s = get_spark(
        app_name="mrsboraetl_tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_mid():
    return "/root/testdata/sf0.01"
