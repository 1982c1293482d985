"""Broadcast side-table handles and the partition lineage manifest."""
