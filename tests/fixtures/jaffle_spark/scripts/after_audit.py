"""After-script: observable side effect + context access
(the reference asserts 'the following scripts are ran' — here we write
a marker row into a table the test can read)."""

import os

model_name = context.current_model.name  # noqa: F821 (injected global)
n_rows = ref(model_name).count()  # noqa: F821

marker = os.environ.get("AUDIT_MARKER_FILE")
if marker:
    with open(marker, "a") as f:
        f.write(f"{model_name}:{n_rows}:{context.current_model.status}\n")  # noqa: F821
