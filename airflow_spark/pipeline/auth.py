"""OIDC/JWT bearer authentication for the control plane.

Reference analog: the reference webserver validates signed OAuth
access tokens OFFLINE — it fetches the IdP's JWKS document and checks
the RS256 signature, audience, subject, and issuer locally
(/root/reference/config/webserver_config.py:93-118, ``PyJWKClient`` +
``jwt.decode(..., algorithms=["RS256"], verify=True)``), maps the
token's ``groups`` claim onto Admin/Viewer roles at login
(:22-63), and clears the session on logout (:74-84).

:class:`JwksRoleProvider` is the engine-native equivalent, shaped for
the ControlPlane's pluggable ``authenticate(headers)`` slot:

- **Offline verification** against LOCAL JWKS document(s) (a dict, a
  path, or a list of either) — no network in the request path or in
  tests; a deployment refreshes the documents out-of-band exactly
  like a JWKS cache would.
- **Kid rollover**: :meth:`rotate` (or the ``retiring_jwks``
  constructor arg) keeps the outgoing key set verifying for a grace
  window — the offline analog of the reference's live JWKS client
  surviving IdP key rotation (webserver_config.py:60-141).
- **RS256 only.** ``alg`` comes from the ATTACKER-CONTROLLED header,
  so the accepted algorithm is pinned server-side: ``none`` and the
  HS256 key-confusion downgrade (signing with the PUBLIC key as an
  HMAC secret) are rejected before any crypto runs.
- **Claims**: ``exp`` is REQUIRED and enforced (with configurable
  leeway), ``nbf``/``iat`` honored when present, ``iss``/``aud``
  checked when the provider is configured with expected values.
- **Group → role sync** through the existing
  :class:`~airflow_spark.pipeline.api.GroupRoleMapper` — the same
  highest-role-wins lattice the static-token provider uses.
- **Logout revocation**: :meth:`revoke` blacklists the token's
  ``jti`` (or a hash of the raw token when the IdP mints no ``jti``)
  until its own ``exp`` passes, after which the entry self-expires —
  the list stays bounded by the number of live revoked tokens.

RSA-PKCS#1-v1.5 verification uses the ``cryptography`` package (a
public, baked-in dependency); the import is guarded so environments
without it still load the module and fail only when the provider is
actually constructed.
"""

from __future__ import annotations

import base64
import hashlib
import json
import threading
import time

from .api import GroupRoleMapper

try:  # guarded: only the JWT provider needs it
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    _HAVE_CRYPTO = True
except ImportError:  # pragma: no cover - env without cryptography
    _HAVE_CRYPTO = False


def _b64url_decode(part: str) -> bytes:
    pad = "=" * (-len(part) % 4)
    return base64.urlsafe_b64decode(part + pad)


def _b64url_uint(part: str) -> int:
    return int.from_bytes(_b64url_decode(part), "big")


class JwtError(ValueError):
    """Raised internally for any verification failure; callers of
    ``authenticate`` only ever see ``None`` (a 401), never the reason
    — error detail in an auth response is an oracle for attackers."""


class JwksRoleProvider:
    """Validate ``Authorization: Bearer <RS256 JWT>`` against a local
    JWKS document and resolve the role from the token's groups claim.

    Parameters
    ----------
    jwks:
        The JWKS document (``{"keys": [{"kty": "RSA", "kid": ...,
        "n": ..., "e": ...}, ...]}``) or a filesystem path to one.
    roles_mapping:
        IdP group → engine role (``Viewer``/``Op``/``Admin``), the
        AUTH_ROLES_MAPPING analog; resolved highest-wins via
        :class:`GroupRoleMapper`.
    issuer / audience:
        When given, ``iss`` must equal / ``aud`` must contain them.
    groups_claim:
        Claim holding the group list (reference uses ``groups``).
    leeway_s:
        Clock-skew allowance for ``exp``/``nbf``.
    clock:
        Injectable time source (tests freeze it; production default
        ``time.time``).
    """

    def __init__(
        self,
        jwks: dict | str | list,
        roles_mapping: dict[str, str],
        issuer: str | None = None,
        audience: str | None = None,
        groups_claim: str = "groups",
        leeway_s: int = 30,
        clock=time.time,
        retiring_jwks: dict | str | list | None = None,
        rotation_grace_s: float = 3600.0,
        retired_at: float | None = None,
    ):
        if not _HAVE_CRYPTO:
            raise RuntimeError(
                "JwksRoleProvider needs the 'cryptography' package for "
                "RS256 verification"
            )
        self._keys = self._load_keys(jwks)
        if not self._keys:
            raise ValueError("JWKS document contains no RSA keys")
        # kid-rollover grace: keys from the RETIRING document(s) still
        # verify until retired_at + rotation_grace_s, after which only
        # the current set is accepted (reference analog: the live JWKS
        # client at config/webserver_config.py:60-141 survives IdP key
        # rollover because old kids stay fetchable for a while)
        self._retiring = (
            self._load_keys(retiring_jwks) if retiring_jwks else {}
        )
        self.rotation_grace_s = float(rotation_grace_s)
        self._retired_at = (
            float(retired_at) if retired_at is not None else clock()
        )
        self._mapper = GroupRoleMapper(roles_mapping)
        self.issuer = issuer
        self.audience = audience
        self.groups_claim = groups_claim
        self.leeway_s = leeway_s
        self._clock = clock
        #: jti/token-hash → exp epoch; entries self-expire (see revoke)
        self._revoked: dict[str, float] = {}
        self._lock = threading.Lock()

    def _load_keys(
        self, jwks: dict | str | list
    ) -> dict[str | None, "rsa.RSAPublicKey"]:
        """Merge one or more JWKS documents (dicts or paths) into a
        kid → public-key map. Later documents win on kid collision."""
        docs = jwks if isinstance(jwks, list) else [jwks]
        keys: dict[str | None, rsa.RSAPublicKey] = {}
        for doc in docs:
            if isinstance(doc, str):
                with open(doc) as f:
                    doc = json.load(f)
            if not isinstance(doc, dict):
                raise ValueError("JWKS document must be a JSON object")
            for k in doc.get("keys", []):
                if k.get("kty") != "RSA":
                    continue
                pub = rsa.RSAPublicNumbers(
                    _b64url_uint(k["e"]), _b64url_uint(k["n"])
                ).public_key()
                keys[k.get("kid")] = pub
        return keys

    def rotate(
        self,
        new_jwks: dict | str | list,
        grace_s: float | None = None,
    ) -> None:
        """Install ``new_jwks`` as the current key set; the previous
        current set becomes the retiring set and keeps verifying for
        ``grace_s`` (default: the configured ``rotation_grace_s``)
        measured from now. Tokens signed with a kid absent from both
        sets — or present only in a retiring set past its grace — 401."""
        new_keys = self._load_keys(new_jwks)
        if not new_keys:
            raise ValueError("JWKS document contains no RSA keys")
        with self._lock:
            self._retiring = dict(self._keys)
            self._keys = new_keys
            self._retired_at = self._clock()
            if grace_s is not None:
                self.rotation_grace_s = float(grace_s)

    # -- provider interface -------------------------------------------------

    def authenticate(self, headers: dict | None) -> dict | None:
        got = (headers or {}).get("Authorization", "")
        if not got.startswith("Bearer "):
            return None
        token = got[len("Bearer "):]
        try:
            claims = self._verify(token)
        except (JwtError, KeyError, ValueError, TypeError):
            return None
        groups = claims.get(self.groups_claim) or []
        if not isinstance(groups, list):
            groups = [groups]
        role = self._mapper.role_for([str(g) for g in groups])
        user = (
            claims.get("preferred_username")
            or claims.get("email")
            or claims.get("sub")
            or "jwt-user"
        )
        # role may be None: dispatch turns that into 403 (authenticated
        # but no recognized role) rather than 401 — same split the
        # static provider produces
        return {"user": user, "role": role, "claims": claims}

    # -- logout / revocation ------------------------------------------------

    def revoke(self, token: str) -> None:
        """Logout analog (reference end-session at
        webserver_config.py:74-84): the token is rejected from now
        until its own ``exp``, after which the entry is garbage."""
        try:
            claims = self._verify(token, _skip_revocation=True)
        except (JwtError, KeyError, ValueError, TypeError):
            return  # an invalid token needs no revocation entry
        with self._lock:
            self._revoked[self._revocation_key(token, claims)] = float(
                claims["exp"]
            )
            self._gc_revoked()

    def _revocation_key(self, token: str, claims: dict) -> str:
        jti = claims.get("jti")
        if jti:
            return f"jti:{jti}"
        return "tok:" + hashlib.sha256(token.encode()).hexdigest()

    def _gc_revoked(self) -> None:
        now = self._clock()
        dead = [k for k, exp in self._revoked.items()
                if exp + self.leeway_s < now]
        for k in dead:
            del self._revoked[k]

    # -- verification core --------------------------------------------------

    def _verify(self, token: str, _skip_revocation: bool = False) -> dict:
        parts = token.split(".")
        if len(parts) != 3:
            raise JwtError("not a compact JWS")
        header = json.loads(_b64url_decode(parts[0]))
        # json.loads of attacker input can yield any JSON value; only
        # an object is a JWS header — a list/str/number here would
        # escape the except tuples in authenticate() as AttributeError
        if not isinstance(header, dict):
            raise JwtError("header is not a JSON object")
        # pin the algorithm server-side; the header value is attacker
        # input (alg=none and RS->HS key-confusion both arrive here)
        if header.get("alg") != "RS256":
            raise JwtError("algorithm not allowed")
        kid = header.get("kid")
        # snapshot (keys, retiring, retired_at) under the rotation
        # lock: a request racing rotate() must never pair the NEW
        # retiring set with the OLD timestamp (transient spurious 401
        # / mis-bounded grace window)
        with self._lock:
            keys = self._keys
            retiring = self._retiring
            retired_at = self._retired_at
        key = keys.get(kid)
        if key is None and kid in retiring:
            # kid-rollover grace window: the retiring key verifies
            # until retired_at + rotation_grace_s, then 401s
            if self._clock() <= retired_at + self.rotation_grace_s:
                key = retiring[kid]
            else:
                raise JwtError("key retired")
        if key is None:
            if kid is None and len(keys) == 1:
                key = next(iter(keys.values()))
            else:
                raise JwtError("unknown kid")
        signing_input = f"{parts[0]}.{parts[1]}".encode()
        try:
            key.verify(
                _b64url_decode(parts[2]),
                signing_input,
                padding.PKCS1v15(),
                hashes.SHA256(),
            )
        except InvalidSignature as ex:
            raise JwtError("bad signature") from ex
        claims = json.loads(_b64url_decode(parts[1]))
        if not isinstance(claims, dict):
            raise JwtError("claims are not a JSON object")
        now = self._clock()
        exp = claims.get("exp")
        if not isinstance(exp, (int, float)):
            raise JwtError("exp claim required")
        if now > exp + self.leeway_s:
            raise JwtError("token expired")
        nbf = claims.get("nbf")
        if isinstance(nbf, (int, float)) and now < nbf - self.leeway_s:
            raise JwtError("token not yet valid")
        if self.issuer is not None and claims.get("iss") != self.issuer:
            raise JwtError("issuer mismatch")
        if self.audience is not None:
            aud = claims.get("aud")
            auds = aud if isinstance(aud, list) else [aud]
            if self.audience not in auds:
                raise JwtError("audience mismatch")
        if not _skip_revocation:
            with self._lock:
                self._gc_revoked()
                if self._revocation_key(token, claims) in self._revoked:
                    raise JwtError("token revoked")
        return claims


# -- test/dev-side minting ---------------------------------------------------


def mint_rs256_jwt(private_key, claims: dict, kid: str | None = None) -> str:
    """Sign ``claims`` into a compact RS256 JWS — the test/dev-side
    issuer stand-in (production tokens come from the IdP; the provider
    above only ever VERIFIES). ``private_key`` is a
    ``cryptography`` RSAPrivateKey."""
    def enc(b: bytes) -> str:
        return base64.urlsafe_b64encode(b).rstrip(b"=").decode()

    header: dict = {"alg": "RS256", "typ": "JWT"}
    if kid is not None:
        header["kid"] = kid
    signing_input = (
        enc(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + enc(json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = private_key.sign(
        signing_input.encode(), padding.PKCS1v15(), hashes.SHA256()
    )
    return signing_input + "." + enc(sig)


def jwk_from_public_key(public_key, kid: str) -> dict:
    """Export a ``cryptography`` RSAPublicKey as a JWKS entry."""
    nums = public_key.public_numbers()

    def enc_uint(v: int) -> str:
        raw = v.to_bytes((v.bit_length() + 7) // 8, "big")
        return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()

    return {
        "kty": "RSA",
        "kid": kid,
        "use": "sig",
        "alg": "RS256",
        "n": enc_uint(nums.n),
        "e": enc_uint(nums.e),
    }
