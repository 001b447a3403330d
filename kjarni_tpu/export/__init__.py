"""Deployment exporters (browser bundle, …)."""
