import pytest


@pytest.fixture(scope="session")
def spark():
    from jam_spark.session import get_spark

    s = get_spark(app="jam_spark_tests", cores=8, shuffle_partitions=8, driver_mem="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pages():
    from jam_spark.corpus import generate_pages

    return generate_pages(n_docs=600, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, corpus_pages):
    from jam_spark.corpus import pages_to_pandas

    return spark.createDataFrame(pages_to_pandas(corpus_pages)).cache()
