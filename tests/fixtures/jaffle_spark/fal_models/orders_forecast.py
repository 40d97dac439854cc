"""Forecast and upload order data.

Near-verbatim port of the reference flagship fal model
(reference: A/cli_tests/projects/002_jaffle_shop/fal_models/
orders_forecast.py:29-53) — same script-model contract (module body
with injected ``ref``/``context``/``write_to_model``), same pandas
idioms (``.rename``, ``.join(lsuffix/rsuffix)``, ``.map`` +
``strftime``). ``ref`` returns a pandas DataFrame because schema.yml
declares ``meta: {fal: {interop: pandas}}`` for this model.

Prophet is not installed in this container, so ``make_forecast``
falls back to a deterministic least-squares linear trend when the
import fails; the e2e test recomputes the same forecast over a
DuckDB-loaded frame and asserts exact equality.
"""

import pandas as pd

try:  # the reference's dependency; absent here
    from prophet import Prophet
except ImportError:
    Prophet = None


def make_forecast(dataframe: pd.DataFrame, periods: int = 30):
    """Make forecast on metric data."""
    if Prophet is not None:
        model = Prophet(daily_seasonality=False, yearly_seasonality=False)
        model.fit(dataframe)
        future = model.make_future_dataframe(periods=periods)
        prediction = model.predict(future)
        return model, prediction

    # deterministic stand-in: OLS linear trend on the day index,
    # extended `periods` days past the last observation
    import numpy as np

    df = dataframe.sort_values("ds").reset_index(drop=True)
    t = np.arange(len(df), dtype="float64")
    y = df["y"].to_numpy(dtype="float64")
    slope, intercept = np.polyfit(t, y, 1)
    future_ds = pd.date_range(
        df["ds"].iloc[-1] + pd.Timedelta(days=1), periods=periods, freq="D"
    )
    all_ds = pd.concat([df["ds"], pd.Series(future_ds)], ignore_index=True)
    t_all = np.arange(len(all_ds), dtype="float64")
    prediction = pd.DataFrame({"ds": all_ds, "yhat": intercept + slope * t_all})
    return None, prediction


df: pd.DataFrame = ref("orders_daily")
print(df)

df_count = df[["order_date", "n_orders"]]
df_count = df_count.rename(columns={"order_date": "ds", "n_orders": "y"})
model_count, forecast_count = make_forecast(df_count, 50)

df_amount = df[["order_date", "total_amount"]]
df_amount = df_amount.rename(columns={"order_date": "ds", "total_amount": "y"})
model_amount, forecast_amount = make_forecast(df_amount, 50)

joined_forecast = forecast_count.join(
    forecast_amount.set_index("ds"),
    on="ds",
    lsuffix="_count",
    rsuffix="_amount",
)
print(joined_forecast.dtypes)

# the reference writes ds as a string for warehouse-type reasons; kept
# verbatim (reference orders_forecast.py:50-52)
joined_forecast["ds"] = joined_forecast["ds"].map(lambda x: x.strftime("%Y-%m-%d"))

# It will use the current model as target, no need to pass it
write_to_model(joined_forecast, mode="overwrite")
