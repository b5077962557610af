"""``python -m datafusion_functions_variant_spark.queries`` —
refresh QUERY_SPECS.json for the upcoming driver verification window
(see ``refresh_spec_ledger``). Run before the end-of-round commit;
``tests/test_registry.py`` enforces freshness."""

from . import _WINDOW, refresh_spec_ledger

if __name__ == "__main__":
    ledger = refresh_spec_ledger()
    print(f"QUERY_SPECS.json: {len(ledger)} entries (window={_WINDOW})")
