"""Clean-room reimplementation of Parthenon's ``parthenon_tools``
analysis package (phdf reader, phdf_diff, compare_analytic) with the
same public API the reference regression suites import."""
