"""Convert a reference-format recognizer_dir (enc_best.pth timm state
dict + FAISS ref.index + ref.txt — contract at
infer_effocr_onnx_multi.py:401-419,496-510) into our native artifact
layout so `infer --recognizer_dir` can consume reference-trained models.
`infer` also auto-converts on first use; this CLI does it explicitly.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--recognizer_dir", type=str, default=None,
                   help="reference-format dir (enc_best.pth + ref.index + "
                        "ref.txt)")
    p.add_argument("--localizer_pt", type=str, default=None,
                   help="ultralytics yolov5 state dict (.pt) — export from "
                        "best.pt via ckpt['model'].float().state_dict()")
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default <recognizer_dir>/tpu_converted; "
                        "required with --localizer_pt)")
    p.add_argument("--arch", type=str, default=None,
                   help="registry arch override (auto-detected from the "
                        "state dict otherwise)")
    p.add_argument("--imsize", type=int, default=224,
                   help="encoder input size the checkpoint was trained at "
                        "(the reference's paired transform is 224, "
                        "utils/datasets_utils.py:166-172)")
    p.add_argument("--input_size", type=int, default=640,
                   help="localizer canvas width (letterbox_engine default)")
    p.add_argument("--input_height", type=int, default=None)
    args = p.parse_args()

    if args.recognizer_dir:
        from effocr_tpu.interop.reference_artifacts import (
            import_reference_recognizer_dir,
        )

        out = import_reference_recognizer_dir(
            args.recognizer_dir, args.out, arch=args.arch,
            image_size=args.imsize,
        )
        print(f"recognizer converted -> {out}")
    if args.localizer_pt:
        if not args.out:
            raise SystemExit("--localizer_pt requires --out")
        from effocr_tpu.interop.yolo_import import (
            import_ultralytics_localizer,
        )

        out = import_ultralytics_localizer(
            args.localizer_pt, args.out, input_size=args.input_size,
            input_height=args.input_height,
        )
        print(f"localizer converted -> {out}")
    if not args.recognizer_dir and not args.localizer_pt:
        raise SystemExit("pass --recognizer_dir and/or --localizer_pt")


if __name__ == "__main__":
    main()
