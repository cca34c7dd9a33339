import { useEffect, useState } from 'react';

export type UserDto = { id: number; name: string; email: string };

/** Fetch one user from the API. */
export function useUser(userId: number) {
  const [user, setUser] = useState<UserDto | null>(null);
  const [loading, setLoading] = useState(true);
  useEffect(() => {
    fetchUser(userId).then((u) => {
      setUser(u);
      setLoading(false);
    });
  }, [userId]);
  return { user, loading };
}

export async function fetchUser(userId: number): Promise<UserDto> {
  const res = await fetch(`/api/users/${userId}`);
  return res.json();
}
