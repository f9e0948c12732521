"""CLI entry points mirroring the reference's six executables:
petibm-navierstokes, petibm-ibpm, petibm-decoupledibpm, petibm-vorticity,
petibm-createxdmf, petibm-writemesh (reference: applications/)."""
