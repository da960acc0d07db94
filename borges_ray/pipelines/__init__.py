"""Pipeline entry points composing stages into full runs."""
