"""Spark operator stages. Each stage is a function DataFrame -> DataFrame
suitable for `df.transform(stage)` chaining (reference pipeline composition:
cube/api.py:108-128)."""
