import React from 'react';
import { useUser } from '../hooks/useUser';

export interface UserCardProps {
  userId: number;
  compact?: boolean;
}

/**
 * Renders a user's profile card.
 */
export function UserCard({ userId, compact }: UserCardProps) {
  const { user, loading } = useUser(userId);
  if (loading) return <div>Loading...</div>;
  return <div className="card">{formatName(user.name)}</div>;
}

export function formatName(name: string): string {
  return name.trim().toUpperCase();
}
