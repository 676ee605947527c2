"""Independent reference implementations used only as test oracles."""
