"""SvtAv1EncApp-shaped CLI."""
