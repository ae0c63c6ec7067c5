"""Physical constants used throughout rajepy_tpu.

Mirrors the role of the reference's ``_constants.py`` (see
/root/reference/_constants.py:1-14) but is self-contained: all SI values are
CODATA-2018 literals so the package has no import-time dependency on scipy.

Unit conventions follow the reference: model grids are in au, densities in
cm^-3, temperatures in K, frequencies in Hz, velocities in km/s unless noted.
"""

# ---------------------------------------------------------------------------
# SI base constants.  Sourced from scipy.constants when available so results
# bit-match the reference (which uses scipy.constants throughout) under the
# installed scipy's CODATA tables; CODATA-2018 literals otherwise.
# ---------------------------------------------------------------------------
try:
    import scipy.constants as _sc
    C = _sc.c                    # speed of light [m/s]
    H = _sc.h                    # Planck constant [J s]
    K_B = _sc.k                  # Boltzmann constant [J/K]
    E_CHARGE = _sc.e             # elementary charge [C]
    M_E = _sc.m_e                # electron mass [kg]
    G = _sc.G                    # gravitational constant [m^3/kg/s^2]
    U_AMU = _sc.u                # atomic mass unit [kg]
    EPSILON_0 = _sc.epsilon_0    # vacuum permittivity [F/m]
    RYDBERG = _sc.Rydberg        # Rydberg constant [1/m]
    AU = _sc.au                  # astronomical unit [m]
    PARSEC = _sc.parsec          # parsec [m]
    YEAR = _sc.year              # 365-day year [s] (the reference uses
    #                              con.year for every yr<->s conversion)
    ARCSEC = _sc.arcsec          # arcsecond [rad]
except ImportError:              # pragma: no cover
    C = 299792458.0
    H = 6.62607015e-34
    K_B = 1.380649e-23
    E_CHARGE = 1.602176634e-19
    M_E = 9.1093837015e-31
    G = 6.6743e-11
    U_AMU = 1.6605390666e-27
    EPSILON_0 = 8.8541878128e-12
    RYDBERG = 10973731.56816
    AU = 149597870700.0
    PARSEC = 3.0856775814671916e16
    YEAR = 31536000.0
    ARCSEC = 4.84813681109536e-06

# ---------------------------------------------------------------------------
# cgs conversions (the reference's RT formulas are cgs; rrls.py:7-11)
# ---------------------------------------------------------------------------
C_CGS = C * 1e2                  # [cm/s]
H_CGS = H * 1e7                  # [erg s]
K_CGS = K_B * 1e7                # [erg/K]
M_E_CGS = M_E * 1e3              # [g]
E_CGS = E_CHARGE * (C * 10.0)    # statC (esu), as rrls.py:9
AU2CM = AU * 1e2                 # _constants.py:3
KM2CM = 1e5                      # _constants.py:4

# ---------------------------------------------------------------------------
# Astronomy
# ---------------------------------------------------------------------------
MSOL = 1.98847e30                # solar mass [kg] (_constants.py:5)

# (protons Z, neutrons N) per element, _constants.py:7-10
NZ = {"H": (1, 0), "He": (2, 2), "Li": (3, 4), "Be": (4, 5),
      "B": (5, 6), "C": (6, 6), "N": (7, 7), "O": (8, 8),
      "F": (9, 10), "Ne": (10, 10), "Na": (11, 12),
      "Mg": (12, 12)}

# Reynolds (1986) free-free constants (_constants.py:12-14)
a_k = 0.212
a_j = 6.5e-38

# Atomic masses in micro-u, keyed by (Z, N).  AME2012 values for the isotopes
# covered by NZ above; replaces the reference's pickled pandas table
# (files/atomic_masses.pkl, read at maths/physics.py:620) with the same data.
ATOMIC_MASS_MICRO_U = {
    (1, 0): 1007825.03207,     # 1H
    (2, 2): 4002603.25415,     # 4He
    (3, 4): 7016004.548,       # 7Li
    (4, 5): 9012182.201,       # 9Be
    (5, 6): 11009305.406,      # 11B
    (6, 6): 12000000.0,        # 12C
    (7, 7): 14003074.00478,    # 14N
    (8, 8): 15994914.61956,    # 16O
    (9, 10): 18998403.224,     # 19F
    (10, 10): 19992440.17542,  # 20Ne
    (11, 12): 22989769.28087,  # 23Na
    (12, 12): 23985041.699,    # 24Mg
}


def atomic_mass(atom: str) -> float:
    """Mass of ``atom`` in kg (reference: maths/physics.py:607-624)."""
    z, n = NZ[atom]
    return ATOMIC_MASS_MICRO_U[(z, n)] * 1e-6 * U_AMU


def z_number(atom: str) -> int:
    """Atomic number (reference: maths/physics.py:523-532)."""
    return NZ[atom][0]


def rydberg_constant(atom: str) -> float:
    """Reduced-mass Rydberg constant in 1/m (maths/physics.py:535-544)."""
    m_atom = atomic_mass(atom)
    return RYDBERG * (m_atom / (m_atom + M_E))
