"""L3 control plane: RRC, NAS, NGAP, F1AP/E1AP, GTP-U, SCTP-style
transport — the openair2/RRC, openair3/{NGAP,NAS,ocp-gtpu,SCTP} and
openair2/{F1AP,E1AP} capability set of the reference.

All host-side Python (the control plane carries no tensor compute); the
ASN.1 PER encodings use the schema-driven bit codec in l3/per.py instead
of the reference's generated asn1c code.
"""
