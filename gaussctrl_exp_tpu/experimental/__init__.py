"""Experimental side modules (parity with the reference's §2.2 extras).

The reference ships several half-finished experiments alongside the published
method (/root/reference/gaussctrl/{ad_render,ad_noise,mv_*}.py). The *working
ideas* are rebuilt here TPU-style; their dead code is not.
"""
