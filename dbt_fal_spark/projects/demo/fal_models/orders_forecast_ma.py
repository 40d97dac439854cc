"""Trailing-mean order forecast — the demo-project rendition of the
reference flagship fal model (reference: A/cli_tests/projects/
002_jaffle_shop/fal_models/orders_forecast.py): a script-style module
body consuming ``ref()`` as a pandas DataFrame (schema.yml declares
``meta: {fal: {interop: pandas}}``), transforming with pandas idioms,
and handing the pandas result back to ``write_to_model``.

The forecast is a 7-row trailing mean — integer rolling sums and one
double division, so the DuckDB oracle reproduces it bit-exactly (a
Prophet-style fit would not hash-match across engines). The pandas
boundary is bounded by construction: the model consumes the ALREADY
AGGREGATED daily table (one row per calendar day), never raw orders —
the aggregate-then-convert shape that keeps interop viable at 100 TB.
"""

import pandas as pd

WINDOW = 7

df: pd.DataFrame = ref("orders_daily")
df = df.sort_values("order_date").reset_index(drop=True)

counts = df[["order_date", "n_orders"]].rename(
    columns={"order_date": "ds", "n_orders": "y"}
)
urgent = df[["order_date", "n_urgent"]].rename(
    columns={"order_date": "ds", "n_urgent": "y"}
)


def trailing_mean(frame: pd.DataFrame, window: int = WINDOW) -> pd.DataFrame:
    out = frame.copy()
    out["yhat"] = out["y"].rolling(window).sum() / float(window)
    return out


forecast_count = trailing_mean(counts)
forecast_urgent = trailing_mean(urgent)

joined_forecast = forecast_count.join(
    forecast_urgent.set_index("ds"),
    on="ds",
    lsuffix="_count",
    rsuffix="_urgent",
)
joined_forecast = joined_forecast.dropna(subset=["yhat_count", "yhat_urgent"])
joined_forecast["ds"] = joined_forecast["ds"].map(lambda x: x.strftime("%Y-%m-%d"))

write_to_model(
    joined_forecast[["ds", "y_count", "y_urgent", "yhat_count", "yhat_urgent"]],
    mode="overwrite",
)
