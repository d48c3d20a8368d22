"""CLI e2e in a temp repo (the reference's test_cli_local.py pattern)."""

from datetime import datetime

from pyspark.sql import Row

from feast_spark.cli import main, parse_repo

REPO_TMPL = '''
from datetime import timedelta
from feast_spark import Entity, FeatureView, FileSource, ValueType

driver = Entity(name="driver", join_key="driver_id", value_type=ValueType.INT64)
driver_stats = FeatureView(
    name="driver_stats",
    entities=["driver"],
    ttl=timedelta(days=2),
    batch_source=FileSource(path="{src}", event_timestamp_column="ts"),
)
'''


def test_cli_apply_and_list(spark, tmp_path, capsys):
    src = str(tmp_path / "stats.parquet")
    spark.createDataFrame(
        [Row(driver_id=1, ts=datetime(2024, 1, 5), conv=0.5)]
    ).write.parquet(src)
    repo_file = tmp_path / "repo.py"
    repo_file.write_text(REPO_TMPL.format(src=src))

    objs = parse_repo(str(repo_file))
    assert {type(o).__name__ for o in objs} == {"Entity", "FeatureView"}

    common = [
        "--registry", str(tmp_path / "reg.json"),
        "--online-path", str(tmp_path / "online"),
        "--master", "local[2]",
    ]
    assert main(common + ["apply", str(repo_file)]) == 0
    out = capsys.readouterr().out
    assert "applied Entity driver" in out
    assert "applied FeatureView driver_stats" in out

    assert main(common + ["materialize", "2024-01-01", "2024-02-01"]) == 0
    assert main(common + ["entities"]) == 0
    assert "driver\tINT64\tdriver_id" in capsys.readouterr().out
    assert main(common + ["feature-views"]) == 0
    assert "features=conv" in capsys.readouterr().out


def test_registry_dump_and_teardown(tmp_path, capsys):
    import json
    import os

    from feast_spark.cli import main

    repo = tmp_path / "repo.py"
    repo.write_text(
        "from feast_spark import Entity, ValueType\n"
        "driver = Entity(name='driver', join_key='driver_id', "
        "value_type=ValueType.INT64)\n"
    )
    reg = str(tmp_path / "registry.json")
    onl = str(tmp_path / "online")
    base = ["--registry", reg, "--online-path", onl, "--master", "local[2]"]
    assert main(base + ["apply", str(repo)]) == 0
    assert main(base + ["registry-dump"]) == 0
    dumped = capsys.readouterr().out
    payload = json.loads(dumped[dumped.index("{"):])
    assert payload["entities"][0]["name"] == "driver"
    assert main(base + ["teardown"]) == 0
    assert not os.path.exists(reg)
