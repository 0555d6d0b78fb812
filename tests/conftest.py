from __future__ import annotations

import pytest

from p_id_text_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=4, shuffle_partitions=4,
                  extra={"spark.driver.memory": "4g"})
    yield s
    s.stop()
