"""Checkpoint / serialization (SURVEY.md §5: "absent in reference").

State model: (CKKSParams, key material, PRNG seeds) fully determine every
derived table — contexts and KSContexts are deterministic host precomputes —
so checkpoints store only params + keys + ciphertext limb arrays as
compressed npz. Restart-from-keys is the failure-recovery story for long
multi-host runs (SURVEY.md §5 "failure detection" row).

Formats are plain numpy so golden-side tooling can read them without JAX.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.params.params import CKKSParams


def params_to_dict(params: CKKSParams) -> dict:
    return dataclasses.asdict(params)


def params_from_dict(d: dict) -> CKKSParams:
    d = dict(d)
    d["q_primes"] = tuple(d["q_primes"])
    d["p_primes"] = tuple(d["p_primes"])
    return CKKSParams(**d)


def save_keychest(path, chest, scheme: str = "ckks") -> None:
    """Persist params + golden key material (device mirrors are re-uploaded).

    Scheme-aware: handles the CKKS KeyChest (incl. conjugation key and the
    sparse-secret encapsulation pair) and the BGV/BFV chests."""
    assert chest.sk is not None, (
        "chest holds no secret key (threshold session?) — nothing to persist"
    )
    path = pathlib.Path(path)
    arrays = {
        "sk_s": chest.sk.s,
        "pk_b": chest.pk.b,
        "pk_a": chest.pk.a,
        "rlk_b": chest.rlk.b,
        "rlk_a": chest.rlk.a,
    }
    for steps, (gk, _) in chest.galois.items():
        arrays[f"gk{steps}_b"] = gk.b
        arrays[f"gk{steps}_a"] = gk.a
    conj = getattr(chest, "conj", None)
    if conj is not None:
        arrays["conj_b"] = conj[0].b
        arrays["conj_a"] = conj[0].a
    eph = getattr(chest, "eph", None)
    if eph is not None:
        arrays["eph_s"] = eph["s_eph"]
        arrays["to_eph_b"], arrays["to_eph_a"] = eph["to_eph"][0].b, eph["to_eph"][0].a
        arrays["from_eph_b"] = eph["from_eph"][0].b
        arrays["from_eph_a"] = eph["from_eph"][0].a
    meta = {
        "params": params_to_dict(chest.params),
        "rotations": sorted(chest.galois.keys()),
        "has_conj": conj is not None,
        "has_eph": eph is not None,
        "scheme": scheme,
    }
    np.savez_compressed(path, __meta__=np.bytes_(json.dumps(meta).encode()), **arrays)


def load_keychest(path, with_scheme: bool = False):
    """Restore a key chest (rebuilds device mirrors from the golden arrays).

    Returns the scheme-appropriate chest class; with_scheme=True returns
    (scheme, chest). Files written before the scheme field load as ckks."""
    from gpufhe_tpu.keys import keys as dkeys

    z = np.load(pathlib.Path(path))
    meta = json.loads(bytes(z["__meta__"]).decode())
    scheme = meta.get("scheme", "ckks")
    params = params_from_dict(meta["params"])
    sk = gckks.SecretKey(s=z["sk_s"])
    pk = gckks.PublicKey(b=z["pk_b"], a=z["pk_a"])
    rlk = gckks.KSKey(b=z["rlk_b"], a=z["rlk_a"])
    galois = {}
    for steps in meta["rotations"]:
        gk = gckks.KSKey(b=z[f"gk{steps}_b"], a=z[f"gk{steps}_a"])
        galois[steps] = (gk, dkeys.upload_ks_key(gk, params))
    common = dict(
        params=params,
        sk=sk,
        pk=pk,
        rlk=rlk,
        device_sk=dkeys.upload_secret_key(sk, params),
        device_pk=dkeys.upload_public_key(pk, params),
        device_rlk=dkeys.upload_ks_key(rlk, params),
        galois=galois,
    )
    if scheme == "bgv":
        from gpufhe_tpu.ciphertext.bgv import BGVKeyChest

        chest = BGVKeyChest(**common)
    elif scheme == "bfv":
        from gpufhe_tpu.ciphertext.bfv import BFVKeyChest

        chest = BFVKeyChest(**common)
    else:
        conj = None
        if meta["has_conj"]:
            ck = gckks.KSKey(b=z["conj_b"], a=z["conj_a"])
            conj = (ck, dkeys.upload_ks_key(ck, params))
        eph = None
        if meta.get("has_eph"):
            to_eph = gckks.KSKey(b=z["to_eph_b"], a=z["to_eph_a"])
            from_eph = gckks.KSKey(b=z["from_eph_b"], a=z["from_eph_a"])
            eph = {
                "s_eph": z["eph_s"],
                "to_eph": (to_eph, dkeys.upload_ks_key(to_eph, params)),
                "from_eph": (from_eph, dkeys.upload_ks_key(from_eph, params)),
            }
        chest = dkeys.KeyChest(conj=conj, eph=eph, **common)
    return (scheme, chest) if with_scheme else chest


def save_device_keychest(path, chest, seeded: bool = True) -> None:
    """Persist a DeviceKeyChest (keys/device_keygen.py).

    seeded=True stores, for every key-switch key whose PRNG seed the chest
    recorded, only the b_mont rows plus the 64-bit key_data — the uniform
    a_mont rows are regenerated on load (threefry is backend-deterministic),
    halving the dominant (a, b) payload. Keys without a recorded seed fall
    back to storing both halves.
    """
    path = pathlib.Path(path)
    seeds = (chest.seeds or {}) if seeded else {}
    arrays = {"sk_s": chest.sk.s}

    def put_ks(name: str, key) -> bool:
        arrays[f"{name}_b"] = np.asarray(key.b_mont)
        if name in seeds:
            arrays[f"{name}_seed"] = np.asarray(seeds[name])
            return True
        arrays[f"{name}_a"] = np.asarray(key.a_mont)
        return False

    put_ks("rlk", chest.device_rlk)
    for steps, (_, gk) in chest.galois.items():
        put_ks(f"gk{steps}", gk)
    if chest.conj is not None:
        put_ks("conj", chest.conj[1])
    has_eph = chest.eph is not None
    if has_eph:
        arrays["eph_s"] = np.asarray(chest.eph["s_eph"])
        put_ks("to_eph", chest.eph["to_eph"][1])
        put_ks("from_eph", chest.eph["from_eph"][1])
    arrays["pk_b"] = np.asarray(chest.device_pk.b_mont)
    if "pk" in seeds:
        arrays["pk_seed"] = np.asarray(seeds["pk"])
    else:
        arrays["pk_a"] = np.asarray(chest.device_pk.a_mont)
    meta = {
        "params": params_to_dict(chest.params),
        "rotations": sorted(chest.galois.keys()),
        "has_conj": chest.conj is not None,
        "has_eph": has_eph,
    }
    np.savez_compressed(path, __meta__=np.bytes_(json.dumps(meta).encode()), **arrays)


def load_device_keychest(path):
    """Restore a DeviceKeyChest, regenerating seeded a_mont rows on device."""
    import jax.numpy as jnp

    from gpufhe_tpu.keys import keys as dkeys
    from gpufhe_tpu.keys.device_keygen import (
        DeviceKeyChest,
        regen_ks_a,
        regen_pk_a,
    )
    from gpufhe_tpu.keys.keys import DeviceKSKey, DevicePublicKey
    from gpufhe_tpu.ops.context import make_context

    z = np.load(pathlib.Path(path))
    meta = json.loads(bytes(z["__meta__"]).decode())
    params = params_from_dict(meta["params"])
    ctx = make_context(params)
    seeds = {}

    def get_ks(name: str) -> DeviceKSKey:
        b = jnp.asarray(z[f"{name}_b"])
        if f"{name}_seed" in z:
            seeds[name] = z[f"{name}_seed"]
            return DeviceKSKey(b_mont=b, a_mont=regen_ks_a(params, ctx, seeds[name]))
        return DeviceKSKey(b_mont=b, a_mont=jnp.asarray(z[f"{name}_a"]))

    sk = gckks.SecretKey(s=z["sk_s"])
    if "pk_seed" in z:
        seeds["pk"] = z["pk_seed"]
        pk_a = regen_pk_a(params, ctx, seeds["pk"])
    else:
        pk_a = jnp.asarray(z["pk_a"])
    pk = DevicePublicKey(b_mont=jnp.asarray(z["pk_b"]), a_mont=pk_a)
    galois = {s: (None, get_ks(f"gk{s}")) for s in meta["rotations"]}
    conj = (None, get_ks("conj")) if meta["has_conj"] else None
    eph = None
    if meta.get("has_eph"):
        eph = {
            "s_eph": z["eph_s"],
            "to_eph": (None, get_ks("to_eph")),
            "from_eph": (None, get_ks("from_eph")),
        }
    return DeviceKeyChest(
        params=params,
        sk=sk,
        device_sk=dkeys.upload_secret_key(sk, params),
        device_pk=pk,
        device_rlk=get_ks("rlk"),
        galois=galois,
        conj=conj,
        eph=eph,
        seeds=seeds or None,
    )


def save_ciphertext(path, ct) -> None:
    """Scheme-aware: CKKS (scale), BGV (pt_factor) and BFV ciphertexts."""
    arrays = {f"c{i}": np.asarray(comp) for i, comp in enumerate(ct.c)}
    meta = {"level": ct.level, "n_components": len(ct.c)}
    if hasattr(ct, "scale"):
        meta["scheme"] = "ckks"
        meta["scale"] = ct.scale
    elif hasattr(ct, "pt_factor"):
        meta["scheme"] = "bgv"
        meta["pt_factor"] = int(ct.pt_factor)
    else:
        meta["scheme"] = "bfv"
    np.savez_compressed(
        pathlib.Path(path), __meta__=np.bytes_(json.dumps(meta).encode()), **arrays
    )


def load_ciphertext(path, device: bool = True):
    import jax.numpy as jnp

    z = np.load(pathlib.Path(path))
    meta = json.loads(bytes(z["__meta__"]).decode())
    comps = [z[f"c{i}"] for i in range(meta["n_components"])]
    if device:
        comps = [jnp.asarray(c.astype(np.uint32)) for c in comps]
    scheme = meta.get("scheme", "ckks")
    if scheme == "bgv":
        from gpufhe_tpu.ciphertext.bgv import BGVCiphertext

        return BGVCiphertext(comps, meta["level"], meta["pt_factor"])
    if scheme == "bfv":
        from gpufhe_tpu.ciphertext.bfv import BFVCiphertext

        return BFVCiphertext(comps, meta["level"])
    from gpufhe_tpu.ciphertext.ct import Ciphertext

    return Ciphertext(comps, meta["level"], meta["scale"])
