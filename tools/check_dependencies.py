"""Dependency availability check (analog of reference
scripts/check_dependencies.py): verifies required packages import, lists
optional ones with what degrades without them.

Usage: python tools/check_dependencies.py  (exit 1 if a required dep is missing)
"""

from __future__ import annotations

import importlib
import sys

#: import name -> display name
REQUIRED = {
    "jax": "JAX",
    "flax": "Flax",
    "optax": "Optax",
    "numpy": "NumPy",
    "yaml": "PyYAML",
    "cv2": "OpenCV",
    "matplotlib": "Matplotlib",
    "PIL": "Pillow",
}

#: import name -> (display name, what degrades without it)
OPTIONAL = {
    "pytesseract": ("pytesseract", "tesseract OCR engine (template engine remains)"),
    "easyocr": ("EasyOCR", "second OCR consensus engine"),
    "torch": ("PyTorch", "torch-checkpoint weight conversion + parity tests"),
    "transformers": ("Transformers", "HF DETR checkpoint loading"),
    "streamlit": ("Streamlit", "the session-browser dashboard (HTML report remains)"),
    "sklearn": ("scikit-learn", "t-SNE/KMeans feature visualization"),
    "orbax.checkpoint": ("Orbax", "orbax-format training checkpoints (npz remains)"),
    "pandas": ("pandas", "dashboard dataframes"),
}


def check(packages: dict, required: bool) -> list[str]:
    missing = []
    for mod, info in packages.items():
        name = info if isinstance(info, str) else info[0]
        try:
            m = importlib.import_module(mod)
            version = getattr(m, "__version__", "?")
            print(f"  ok       {name} ({version})")
        except ImportError:
            if required:
                print(f"  MISSING  {name}  <-- required")
                missing.append(name)
            else:
                print(f"  absent   {name} — degrades: {info[1]}")
    return missing


def main() -> int:
    print("required:")
    missing = check(REQUIRED, required=True)
    print("optional:")
    check(OPTIONAL, required=False)
    if missing:
        print(f"\n{len(missing)} required package(s) missing: {', '.join(missing)}")
        return 1
    print("\nall required dependencies available")
    return 0


if __name__ == "__main__":
    sys.exit(main())
