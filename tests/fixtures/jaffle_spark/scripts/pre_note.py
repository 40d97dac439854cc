"""Structured pre-hook: records its `with:` arguments + model context
so tests can assert hook argument injection (reference: fal_script.py:43-83)."""
import json
import os

out = os.path.join(os.path.dirname(__file__), "..", "target", "pre_note.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(
        {
            "model": context.current_model.name,  # noqa: F821
            "arguments": context.arguments,  # noqa: F821
        },
        f,
    )
