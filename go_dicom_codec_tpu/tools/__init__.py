"""Command-line tools (role of reference cmd/)."""
