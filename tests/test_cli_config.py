"""Config loader + CLI parity (SURVEY.md C10 / entry point A analog).

The CLI test runs in-process (``cli.main``) against a small corpus
and checks the reference's output contract: flat ``out-<b>`` files,
one per bucket including EMPTY buckets (the reference KeyErrors on
those, ``src/worker.py:126`` — recorded quirk we must not share).
"""

from __future__ import annotations

import os
import textwrap

from mapreducewordcount_spark.cli import main
from mapreducewordcount_spark.config import load_config


def test_load_reference_schema_config(tmp_path):
    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text(textwrap.dedent("""\
        driver:
          host: "localhost"
          port: 5001
        mapreduce:
          num_map_tasks: 6
          num_reduce_tasks: 4
        directories:
          input: "../files/inputs"
          intermediate: "../files/intermediate"
          output: "../files/out"
        task_settings:
          retry_attempts: 3
          retry_delay: 5
    """))
    cfg = load_config(str(cfg_file))
    assert cfg.n == 6 and cfg.m == 4
    # relative dirs anchor on the config file's directory
    assert cfg.input_dir == os.path.normpath(str(tmp_path / "../files/inputs"))
    assert cfg.tokenizer_mode == "native"


def test_cli_run_produces_reference_layout(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("apple banana apple\n")
    (src / "skip.pdf").write_text("nope\n")
    out = tmp_path / "out"

    rc = main(["run", "--input", str(src), "--output", str(out), "-m", "7"])
    assert rc == 0

    files = sorted(f for f in os.listdir(out) if f.startswith("out-"))
    assert files == [f"out-{b}" for b in range(7)]  # all M files exist
    content = {}
    for f in files:
        lines = (out / f).read_text().splitlines()
        assert lines == sorted(lines)
        for ln in lines:
            w, c = ln.rsplit(" ", 1)
            content[w] = int(c)
    assert content == {"apple": 2, "banana": 1}
    # apple/a -> 97%7=6; banana/b -> 98%7=0; other buckets empty but present
    assert (out / "out-6").read_text() == "apple 2\n"
    assert (out / "out-0").read_text() == "banana 1\n"
    assert (out / "out-1").read_text() == ""


def test_cli_requires_input_or_config(capsys):
    assert main(["run", "--input", "/tmp/x"]) == 2


def test_cli_stream_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("stream me stream\n")
    out = tmp_path / "out"
    rc = main(["stream", "--input", str(src), "--output", str(out),
               "-m", "4", "--once"])
    assert rc == 0
    merged = {}
    for b in range(4):
        for ln in (out / f"out-{b}").read_text().splitlines():
            w, c = ln.rsplit(" ", 1)
            merged[w] = int(c)
    assert merged == {"stream": 2, "me": 1}
