"""Convert a reference-format recognizer_dir (enc_best.pth timm state
dict + FAISS ref.index + ref.txt — contract at
infer_effocr_onnx_multi.py:401-419,496-510) into our native artifact
layout so `infer --recognizer_dir` can consume reference-trained models.
`infer` also auto-converts on first use; this CLI does it explicitly.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--recognizer_dir", type=str, required=True,
                   help="reference-format dir (enc_best.pth + ref.index + "
                        "ref.txt)")
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default <recognizer_dir>/tpu_converted)")
    p.add_argument("--arch", type=str, default=None,
                   help="registry arch override (auto-detected from the "
                        "state dict otherwise)")
    p.add_argument("--imsize", type=int, default=224,
                   help="encoder input size the checkpoint was trained at "
                        "(the reference's paired transform is 224, "
                        "utils/datasets_utils.py:166-172)")
    args = p.parse_args()

    from effocr_tpu.interop.reference_artifacts import (
        import_reference_recognizer_dir,
    )

    out = import_reference_recognizer_dir(
        args.recognizer_dir, args.out, arch=args.arch,
        image_size=args.imsize,
    )
    print(f"converted -> {out}")


if __name__ == "__main__":
    main()
