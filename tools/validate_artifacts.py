"""Validate a session's artifacts against the JSON Schemas in schemas/
(analog of reference tools/gx_validate.py — data-contract validation).

Usage:
  python tools/validate_artifacts.py --session output/<session_id> [--schemas schemas/]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

#: artifact (relative to session dir) -> schema filename
CONTRACTS = {
    "metadata.json": "metadata.schema.json",
    "summary.json": "summary.schema.json",
    "pipeline_checkpoint.json": "pipeline_checkpoint.schema.json",
    "04_transform/coordinate_transformations.json": "coordinate_transformations.schema.json",
}


def validate_session(session_dir: Path, schemas_dir: Path) -> list[str]:
    import jsonschema

    errors: list[str] = []
    for rel, schema_name in CONTRACTS.items():
        artifact = session_dir / rel
        schema_path = schemas_dir / schema_name
        if not artifact.exists():
            errors.append(f"MISSING  {rel}")
            continue
        try:
            instance = json.loads(artifact.read_text())
            schema = json.loads(schema_path.read_text())
            jsonschema.validate(instance, schema)
            print(f"OK       {rel}")
        except jsonschema.ValidationError as e:
            errors.append(f"INVALID  {rel}: {e.message} at {list(e.absolute_path)}")
        except (OSError, json.JSONDecodeError) as e:
            errors.append(f"ERROR    {rel}: {e}")
    return errors


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="validate session artifacts")
    parser.add_argument("--session", required=True, type=Path)
    parser.add_argument(
        "--schemas", type=Path,
        default=Path(__file__).resolve().parents[1] / "schemas",
    )
    args = parser.parse_args(argv)
    errors = validate_session(args.session.resolve(), args.schemas)
    for e in errors:
        print(e)
    print(f"{'FAIL' if errors else 'PASS'}: {len(CONTRACTS) - len(errors)}/{len(CONTRACTS)} artifacts valid")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
