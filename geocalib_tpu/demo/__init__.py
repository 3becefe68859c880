"""Demos: CLI overlay demo, gradio web app (optional dependency)."""
