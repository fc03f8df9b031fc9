"""CLI surface smoke: every `python -m effocr_tpu <cmd>` module imports and
serves --help (argparse SystemExit 0) — catches import-time breakage in
commands that have no dedicated test drive."""

import importlib
import sys

import pytest

COMMANDS = [
    "make_corpus", "make_charset", "format_dataset",
    "train_recognizer", "train_localizer", "train_seq2seq", "build_index",
    "build_freq_dict", "export", "import_trocr", "import_encoder",
    "infer", "serve", "viz",
]
COCO_CMDS = ["coco_split", "coco_combine", "coco_subset"]


@pytest.mark.parametrize("cmd", COMMANDS)
def test_cli_help(cmd, monkeypatch, capsys):
    mod = importlib.import_module(f"effocr_tpu.cli.{cmd}")
    assert hasattr(mod, "main"), cmd
    monkeypatch.setattr(sys, "argv", [cmd, "--help"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code in (0, None), (cmd, e.value.code)
    assert "usage" in capsys.readouterr().out.lower()


@pytest.mark.parametrize("cmd", COCO_CMDS)
def test_cli_coco_tools_help(cmd, monkeypatch, capsys):
    from effocr_tpu.cli import coco_tools

    monkeypatch.setattr(sys, "argv", [cmd, "--help"])
    with pytest.raises(SystemExit) as e:
        coco_tools.main(cmd)
    assert e.value.code in (0, None), (cmd, e.value.code)
    assert "usage" in capsys.readouterr().out.lower()


def test_main_dispatch_table_covers_commands():
    """__main__'s dispatch table and this test's command list stay in
    sync (a new CLI must be registered in both)."""
    import effocr_tpu.__main__ as m
    import inspect

    src = inspect.getsource(m)
    for cmd in COMMANDS + COCO_CMDS:
        assert f'"{cmd}"' in src, f"{cmd} missing from __main__ dispatch"
