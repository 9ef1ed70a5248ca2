"""texture subpackage."""
