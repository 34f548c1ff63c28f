"""Download CALVIN datasets / language embeddings / published HULC weights.

One CLI covering the reference's three shell scripts
(dataset/download_data.sh, dataset/download_lang_embeddings.sh,
checkpoints/download_model_weights.sh). URLs are the CALVIN/HULC project's
public hosting. Downloaded torch checkpoints convert to flax params with
``python -m hulc_tpu.training.torch_convert`` (see MIGRATING.md).

Usage:
    python scripts/download_assets.py data D|ABC|ABCD|debug [--dest DIR]
    python scripts/download_assets.py lang D|ABC|ABCD [--dest DIR]
    python scripts/download_assets.py weights D|ABC|ABCD [--dest DIR]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import urllib.request
import zipfile

DATA = {
    "D": "http://calvin.cs.uni-freiburg.de/dataset/task_D_D.zip",
    "ABC": "http://calvin.cs.uni-freiburg.de/dataset/task_ABC_D.zip",
    "ABCD": "http://calvin.cs.uni-freiburg.de/dataset/task_ABCD_D.zip",
    "debug": "http://calvin.cs.uni-freiburg.de/dataset/calvin_debug_dataset.zip",
}
LANG = {
    s: [
        f"http://hulc.cs.uni-freiburg.de/language_embeddings/{p}_lang_embs_train.zip",
        f"http://hulc.cs.uni-freiburg.de/language_embeddings/{p}_lang_embs_val.zip",
    ]
    for s, p in (("D", "D_D"), ("ABC", "ABC_D"), ("ABCD", "ABCD_D"))
}
WEIGHTS = {
    s: f"http://hulc.cs.uni-freiburg.de/model_weights/HULC_{p}.zip"
    for s, p in (("D", "D_D"), ("ABC", "ABC_D"), ("ABCD", "ABCD_D"))
}


def fetch(url: str, dest: pathlib.Path) -> None:
    name = url.rsplit("/", 1)[-1]
    zip_path = dest / name
    print(f"[download] {url} -> {zip_path}")

    def hook(blocks, bsize, total):
        done = blocks * bsize
        if total > 0:
            sys.stdout.write(f"\r  {done / 1e6:.0f}/{total / 1e6:.0f} MB")
            sys.stdout.flush()

    urllib.request.urlretrieve(url, zip_path, reporthook=hook)
    print(f"\n[download] unzipping {name}")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest)
    zip_path.unlink()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("kind", choices=["data", "lang", "weights"])
    p.add_argument("split", help="D | ABC | ABCD (| debug for data)")
    p.add_argument("--dest", default=".", help="destination directory")
    args = p.parse_args(argv)

    table = {"data": DATA, "lang": LANG, "weights": WEIGHTS}[args.kind]
    if args.split not in table:
        raise SystemExit(f"unknown split {args.split!r}; choose from {sorted(table)}")
    dest = pathlib.Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)
    urls = table[args.split]
    for url in urls if isinstance(urls, list) else [urls]:
        fetch(url, dest)
    if args.kind == "weights":
        print(
            "[download] convert with: python -m hulc_tpu.training.torch_convert "
            f"{dest}/<ckpt>.ckpt params.npz --config hulc"
        )


if __name__ == "__main__":
    main()
