import sys


def main():
    from effocr_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    if len(sys.argv) < 2:
        print(__import__("effocr_tpu.cli", fromlist=["__doc__"]).__doc__)
        sys.exit(1)
    cmd = sys.argv.pop(1).replace("-", "_")
    mods = {
        "make_corpus": "effocr_tpu.cli.make_corpus",
        "build_freq_dict": "effocr_tpu.cli.build_freq_dict",
        "make_charset": "effocr_tpu.cli.make_charset",
        "format_dataset": "effocr_tpu.cli.format_dataset",
        "train_recognizer": "effocr_tpu.cli.train_recognizer",
        "train_localizer": "effocr_tpu.cli.train_localizer",
        "train_seq2seq": "effocr_tpu.cli.train_seq2seq",
        "build_index": "effocr_tpu.cli.build_index",
        "build_homoglyphs": "effocr_tpu.cli.build_homoglyphs",
        "export": "effocr_tpu.cli.export",
        "import_trocr": "effocr_tpu.cli.import_trocr",
        "import_encoder": "effocr_tpu.cli.import_encoder",
        "import_reference": "effocr_tpu.cli.import_reference",
        "infer": "effocr_tpu.cli.infer",
        "error_analysis": "effocr_tpu.cli.error_analysis",
        "serve": "effocr_tpu.cli.serve",
        "viz": "effocr_tpu.cli.viz",
        "coco_split": "effocr_tpu.cli.coco_tools",
        "coco_combine": "effocr_tpu.cli.coco_tools",
        "coco_subset": "effocr_tpu.cli.coco_tools",
    }
    if cmd not in mods:
        print(f"unknown command {cmd}; have {sorted(set(mods))}")
        sys.exit(1)
    mod = __import__(mods[cmd], fromlist=["main"])
    if cmd.startswith("coco_"):
        mod.main(cmd)
    else:
        mod.main()


if __name__ == "__main__":
    main()
