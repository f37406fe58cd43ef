import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from job_post_similarity_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from job_post_similarity_spark.sources.io import load_table

    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from job_post_similarity_spark.sources.io import load_table

    return load_table(spark, sf_dir, "documents").cache()
